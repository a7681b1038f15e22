"""Wire-plane restart persistence (reference cluster e2e
scripts/recovery_test.py at single-storage scope): a serving process is
SIGKILLed mid-life (power-loss analog — no graceful close, no flushes),
a fresh process re-serves the same root, and every committed entry is
delivered in order, the log stays writable, and the new write is
readable. The server process is the CLI's `serve` mode, so this also
exercises walrus-cli end to end."""

from __future__ import annotations

import os
import subprocess
import sys
import time

import pytest

from walrus_spark.log import CommandClient

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _start_server(root: str, cwd: str) -> tuple[subprocess.Popen, str, int]:
    p = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "walrus_spark.cli",
            "serve",
            "--root",
            root,
            "--listen",
            "127.0.0.1:0",
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        env=dict(os.environ, PYTHONPATH=_REPO),
        cwd=cwd,
    )
    deadline = time.monotonic() + 180
    while time.monotonic() < deadline:
        line = p.stdout.readline()
        if not line:
            raise AssertionError("serve exited before binding")
        if line.startswith("serving "):
            addr = line.rsplit(" on ", 1)[1].strip()
            host, _, port = addr.rpartition(":")
            return p, host, int(port)
    raise AssertionError("serve never reported its address")


@pytest.mark.slow
def test_wire_recovery_after_server_sigkill(tmp_path):
    root = str(tmp_path / "shared")
    p = None
    p2 = None
    try:
        p, host, port = _start_server(root, str(tmp_path))
        c = CommandClient(host, port)
        assert c.send("REGISTER recovery_topic") == "OK"
        for i in range(10):
            # OK means the entry's commit is durable (reply-after-commit
            # + fsync'd part file), so it MUST survive the kill below
            assert c.send(f"PUT recovery_topic msg-{i}") == "OK"
        c.close()

        p.kill()  # power-loss analog: no graceful shutdown path runs
        p.wait(timeout=30)

        p2, host2, port2 = _start_server(root, str(tmp_path))
        c2 = CommandClient(host2, port2)
        msgs = []
        for _ in range(10):
            r = c2.send("GET recovery_topic")
            assert r.startswith("OK "), r
            msgs.append(r[3:])
        assert msgs == [f"msg-{i}" for i in range(10)]
        assert c2.send("GET recovery_topic") == "EMPTY"

        # still writable after recovery, and the new entry is readable
        assert c2.send("PUT recovery_topic post-crash-msg") == "OK"
        assert c2.send("GET recovery_topic") == "OK post-crash-msg"
        assert c2.send("GET recovery_topic") == "EMPTY"
        c2.close()
    finally:
        for proc in (p, p2):
            if proc is not None and proc.poll() is None:
                proc.kill()
                proc.wait(timeout=30)
