"""The topic-log core: WalrusLog (batch plane) + canonical log schema."""

from walrus_spark.log.wal import (  # noqa: F401
    LOG_SCHEMA,
    ChecksumError,
    FsyncSchedule,
    NotLeaderError,
    ReadConsistency,
    WalrusLog,
    WalrusLogBuilder,
    WouldBlockError,
)
from walrus_spark.log.views import (  # noqa: F401
    register_topic_view,
    typed_log_view,
    typed_topic_view,
)
from walrus_spark.log.commands import (  # noqa: F401
    CommandClient,
    CommandServer,
    CommandShell,
)
