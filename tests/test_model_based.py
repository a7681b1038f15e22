"""Model-based (hypothesis stateful) test of the WalrusLog core.

A RuleBasedStateMachine drives random interleavings of the reference's
API surface — append / batch_append (O1-O2), read_next consume+peek
(O3), batch_read with entry caps and stateless start_offset (O4),
restart recovery (O5), vacuum (O6), counts/watermarks (O9-O11) —
against a pure-python model (per-topic entry list + consumed cursor).
The reference tests these semantics with hand-rolled generated
patterns (tests/integration.rs, batch_read.rs); hypothesis explores
the interleavings systematically and shrinks failures to minimal
op sequences. StrictlyAtOnce consistency: a restart must preserve the
consumed cursor exactly (no re-delivery, no skips)."""

from __future__ import annotations

import shutil
import tempfile

import hypothesis.strategies as st
from hypothesis import settings
from hypothesis.stateful import (
    RuleBasedStateMachine,
    invariant,
    rule,
    run_state_machine_as_test,
)

from walrus_spark.log import WalrusLog

TOPICS = ["alpha", "beta"]
PAYLOADS = st.binary(min_size=0, max_size=24)
WIRE_PAYLOADS = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=12
)


def test_log_model_based(spark):
    base = tempfile.mkdtemp(prefix="wal_model_")

    class LogMachine(RuleBasedStateMachine):
        def __init__(self) -> None:
            super().__init__()
            self.root = tempfile.mkdtemp(dir=base)
            self.log = WalrusLog(spark, self.root)
            self.entries: dict[str, list[bytes]] = {t: [] for t in TOPICS}
            self.cursor: dict[str, int] = {t: 0 for t in TOPICS}

        # ---- writes -------------------------------------------------
        @rule(topic=st.sampled_from(TOPICS), payload=PAYLOADS)
        def append(self, topic: str, payload: bytes) -> None:
            off = self.log.append(topic, payload)
            self.entries[topic].append(payload)
            assert off == len(self.entries[topic])

        @rule(
            topic=st.sampled_from(TOPICS),
            payloads=st.lists(PAYLOADS, min_size=0, max_size=5),
        )
        def batch_append(self, topic: str, payloads: list[bytes]) -> None:
            first, last = self.log.batch_append(topic, payloads)
            base_n = len(self.entries[topic])
            self.entries[topic].extend(payloads)
            assert (first, last) == (base_n + 1, base_n + len(payloads))

        # ---- reads --------------------------------------------------
        @rule(topic=st.sampled_from(TOPICS))
        def read_next_peek_then_consume(self, topic: str) -> None:
            expected = (
                self.entries[topic][self.cursor[topic]]
                if self.cursor[topic] < len(self.entries[topic])
                else None
            )
            assert self.log.read_next(topic, checkpoint=False) == expected
            got = self.log.read_next(topic, checkpoint=True)
            assert got == expected
            if expected is not None:
                self.cursor[topic] += 1

        @rule(topic=st.sampled_from(TOPICS), n=st.integers(1, 4))
        def batch_read_consume(self, topic: str, n: int) -> None:
            want = self.entries[topic][
                self.cursor[topic] : self.cursor[topic] + n
            ]
            got = self.log.batch_read(topic, max_entries=n)
            assert got == want
            self.cursor[topic] += len(got)

        @rule(topic=st.sampled_from(TOPICS), budget=st.integers(0, 48))
        def batch_read_byte_budget(self, topic: str, budget: int) -> None:
            """O4's byte-budget contract: deliver the longest prefix
            whose cumulative payload bytes fit the budget — but always
            at least ONE entry when any is available."""
            want: list[bytes] = []
            cum = 0
            for e in self.entries[topic][self.cursor[topic] :]:
                cum += len(e)
                if cum <= budget or not want:
                    want.append(e)
                else:
                    break
            got = self.log.batch_read(topic, max_bytes=budget)
            assert got == want
            self.cursor[topic] += len(got)

        @rule(topic=st.sampled_from(TOPICS), off=st.integers(0, 30), n=st.integers(1, 4))
        def stateless_read(self, topic: str, off: int, n: int) -> None:
            want = self.entries[topic][off : off + n]
            got = self.log.batch_read(
                topic, start_offset=off, max_entries=n, checkpoint=False
            )
            assert got == want  # and the shared cursor is untouched

        # ---- lifecycle ----------------------------------------------
        @rule()
        def restart(self) -> None:
            self.log.close()
            self.log = WalrusLog(spark, self.root)
            # StrictlyAtOnce: the consumed cursor survives exactly

        @rule()
        def vacuum(self) -> None:
            self.log.vacuum()  # reclamation never changes semantics

        # ---- invariants ---------------------------------------------
        @invariant()
        def counts_and_watermarks_match_model(self) -> None:
            for t in TOPICS:
                n = len(self.entries[t])
                if n == 0 and self.log.high_watermark(t) == 0:
                    continue
                assert self.log.high_watermark(t) == n
                assert self.log.topic_entry_count(t) == n - self.cursor[t]
                assert self.log.cursor(t) == self.cursor[t]

        def teardown(self) -> None:
            self.log.close()
            shutil.rmtree(self.root, ignore_errors=True)

    try:
        run_state_machine_as_test(
            LogMachine,
            settings=settings(
                max_examples=4,
                stateful_step_count=12,
                deadline=None,
                derandomize=True,  # CI-stable exploration
            ),
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_wire_shell_model_based(spark):
    """Stateful exploration of the WIRE plane (CommandShell): PUTs ride
    the group committer, GETs ride the per-topic read-ahead buffer, and
    library-API consumers/appenders interleave freely — the optimistic
    expect-commit must keep the shared cursor exactly-once under every
    interleaving hypothesis finds (the generalization of the
    directed coherence tests in test_commands.py)."""
    import shutil as _shutil
    import tempfile as _tempfile

    from walrus_spark.log import CommandShell

    base = _tempfile.mkdtemp(prefix="wal_wire_model_")

    class WireMachine(RuleBasedStateMachine):
        def __init__(self) -> None:
            super().__init__()
            self.root = _tempfile.mkdtemp(dir=base)
            self.log = WalrusLog(spark, self.root)
            self.shell = CommandShell(self.log)
            for t in TOPICS:
                assert self.shell.execute(f"REGISTER {t}") == "OK"
            self.entries: dict[str, list[str]] = {t: [] for t in TOPICS}
            self.cursor: dict[str, int] = {t: 0 for t in TOPICS}

        @rule(topic=st.sampled_from(TOPICS), payload=WIRE_PAYLOADS)
        def wire_put(self, topic: str, payload: str) -> None:
            assert self.shell.execute(f"PUT {topic} {payload}") == "OK"
            self.entries[topic].append(payload)

        @rule(topic=st.sampled_from(TOPICS), payload=WIRE_PAYLOADS)
        def library_append(self, topic: str, payload: str) -> None:
            self.log.append(topic, payload.encode())
            self.entries[topic].append(payload)

        @rule(topic=st.sampled_from(TOPICS))
        def wire_get(self, topic: str) -> None:
            if self.cursor[topic] < len(self.entries[topic]):
                want = "OK " + self.entries[topic][self.cursor[topic]]
                self.cursor[topic] += 1
            else:
                want = "EMPTY"
            assert self.shell.execute(f"GET {topic}") == want

        @rule(topic=st.sampled_from(TOPICS), n=st.integers(1, 3))
        def library_consume(self, topic: str, n: int) -> None:
            """A library consumer races the shell's buffer — the next
            wire GET must resync, never re-deliver."""
            want = [
                e.encode()
                for e in self.entries[topic][
                    self.cursor[topic] : self.cursor[topic] + n
                ]
            ]
            got = self.log.batch_read(topic, max_entries=n)
            assert got == want
            self.cursor[topic] += len(got)

        @rule(topic=st.sampled_from(TOPICS))
        def wire_state(self, topic: str) -> None:
            import json as _json

            s = _json.loads(self.shell.execute(f"STATE {topic}"))
            assert s["high_watermark"] == len(self.entries[topic])
            assert s["cursor"] == self.cursor[topic]
            assert s["unconsumed"] == (
                len(self.entries[topic]) - self.cursor[topic]
            )

        @invariant()
        def shared_cursor_matches_model(self) -> None:
            for t in TOPICS:
                assert self.log.cursor(t) == self.cursor[t]

        def teardown(self) -> None:
            self.shell.close()
            self.log.close()
            _shutil.rmtree(self.root, ignore_errors=True)

    try:
        run_state_machine_as_test(
            WireMachine,
            settings=settings(
                max_examples=4,
                stateful_step_count=12,
                deadline=None,
                derandomize=True,
            ),
        )
    finally:
        _shutil.rmtree(base, ignore_errors=True)
