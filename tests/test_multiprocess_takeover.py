"""Multi-process takeover e2e (r5 directive #1): the flock writer
fencing proven at its REAL boundary — two OS processes, one shared
data dir, seizure mid-stream.

Process A (tests/procs/takeover_writer.py) serves the wire protocol
and appends continuously; process B (takeover_claimant.py) opens the
same root, which claims writership under the flock fence, and keeps
appending. Invariants checked here in the parent:

  - A observes NotLeaderError on its first commit after the claim and
    commits NOTHING afterwards (write fencing, bucket.rs:110-118);
  - a wire PUT through fenced A replies ERR naming the fencing;
  - per-topic offsets are contiguous 1..hw with A's committed ranges
    and B's committed ranges partitioning them exactly — no committed
    offset lost, none duplicated (InvSeqOrder analog,
    distributed-walrus/spec/DistributedWalrus.tla:174-177);
  - every stored payload matches the writer that committed its range;
  - the consumer delivery contract holds ACROSS the takeover: entries
    the parent consumed through A's wire server pre-takeover are never
    re-delivered, and a post-takeover consumer resumes at the shared
    cursor exactly (the reference's resilience/recovery e2e story,
    distributed-walrus/scripts/resilience_test.py, recovery_test.py).

This is the only r5 coverage gap flagged as 'missing': every prior
fencing/takeover test ran threads inside one Python process.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import pytest

from walrus_spark.log import CommandClient, WalrusLog

_PROCS = os.path.join(os.path.dirname(__file__), "procs")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _wait_for(path: str, timeout: float, what: str):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
        time.sleep(0.2)
    raise AssertionError(f"timed out waiting for {what} ({path})")


def _read_json(path: str):
    with open(path) as f:
        return json.load(f)


@pytest.mark.slow
def test_two_process_takeover_fences_writer_and_loses_nothing(
    spark, tmp_path
):
    root = str(tmp_path / "shared")
    rv = str(tmp_path / "rv")
    os.makedirs(rv)
    env = dict(os.environ, PYTHONPATH=_REPO)

    def _spawn(script: str) -> subprocess.Popen:
        return subprocess.Popen(
            [sys.executable, os.path.join(_PROCS, script), root, rv],
            env=env,
            cwd=str(tmp_path),
            stdout=subprocess.DEVNULL,
            stderr=subprocess.STDOUT,
        )

    a = _spawn("takeover_writer.py")
    b = None
    client = None
    try:
        port = _wait_for(
            os.path.join(rv, "a_port.json"), 180, "A's wire server"
        )
        # wait until A has durably committed a few batches mid-stream
        state_path = os.path.join(rv, "a_committed.json")
        deadline = time.monotonic() + 180
        while True:
            st = (
                _read_json(state_path)
                if os.path.exists(state_path)
                else {"ranges": []}
            )
            if len(st["ranges"]) >= 4:
                break
            assert time.monotonic() < deadline, "A never reached 4 commits"
            time.sleep(0.2)

        # consume a couple of entries through A's wire plane BEFORE the
        # takeover — the delivery-contract half of the test
        client = CommandClient(port["host"], port["port"])
        pre = [client.send("GET t") for _ in range(2)]
        assert all(r.startswith("OK ") for r in pre), pre
        pre_payloads = [r[3:] for r in pre]
        assert pre_payloads == ["a-0-0", "a-0-1"]

        # B seizes writership MID-STREAM (A is still appending)
        b = _spawn("takeover_claimant.py")
        b_res = _wait_for(os.path.join(rv, "b_result.json"), 240, "B result")
        assert b.wait(timeout=60) == 0

        # A must notice the fence on its next commit and stop
        deadline = time.monotonic() + 120
        while True:
            a_state = _read_json(state_path)
            if a_state.get("fenced"):
                break
            assert time.monotonic() < deadline, "A never reported fencing"
            time.sleep(0.2)
        assert not a_state.get("timeout")

        # a wire PUT through the fenced writer degrades loudly
        reply = client.send("PUT t should-be-refused")
        assert reply.startswith("ERR"), reply
        assert "fenced" in reply or "epoch" in reply, reply

        # release A and let it exit cleanly
        with open(os.path.join(rv, "a_stop"), "w") as f:
            f.write("done")
        assert a.wait(timeout=120) == 0

        # ---- offset bookkeeping invariants (InvSeqOrder analog) ----
        a_ranges = [tuple(r) for r in a_state["ranges"]]
        b_ranges = [tuple(r) for r in b_res["ranges"]]
        hw = b_res["hw"]
        covered = []
        for first, last in a_ranges + b_ranges:
            covered.extend(range(first, last + 1))
        # contiguous 1..hw, each offset committed exactly once
        assert sorted(covered) == list(range(1, hw + 1))
        assert len(covered) == len(set(covered))
        # A's history strictly precedes B's (fencing is total)
        assert max(last for _, last in a_ranges) < min(
            first for first, _ in b_ranges
        )

        # ---- stored payloads match the committing writer ----
        entries = {off: payload for off, payload in b_res["entries"]}
        assert sorted(entries) == list(range(1, hw + 1))
        for bi, (first, last) in enumerate(a_ranges):
            for k, off in enumerate(range(first, last + 1)):
                assert entries[off] == f"a-{bi}-{k}", (off, entries[off])
        for bi, (first, last) in enumerate(b_ranges):
            for k, off in enumerate(range(first, last + 1)):
                assert entries[off] == f"b-{bi}-{k}", (off, entries[off])

        # ---- delivery contract across the takeover ----
        # the two wire-consumed entries were committed to the SHARED
        # persistent cursor; a successor consumer (third instance)
        # resumes exactly after them — no re-delivery, no skips
        ver = WalrusLog(spark, root)
        try:
            assert ver.cursor("t") == 2
            delivered = []
            while True:  # drain in <=2000-entry batches (the O4 cap)
                batch = ver.batch_read("t", max_entries=2000)
                if not batch:
                    break
                delivered.extend(batch)
            assert [d.decode() for d in delivered] == [
                entries[off] for off in range(3, hw + 1)
            ]
            assert ver.topic_entry_count("t") == 0
        finally:
            ver.close()
    finally:
        if client is not None:
            client.close()
        with open(os.path.join(rv, "a_stop"), "w") as f:
            f.write("done")
        for p in (a, b):
            if p is not None and p.poll() is None:
                p.kill()
                p.wait(timeout=30)
