"""walrus-cli analog tests (walrus_spark/cli.py) — the reference's CLI
surface (distributed-walrus/src/bin/walrus-cli.rs, cli_client.rs)
driven as real subprocesses against a live CommandServer: subcommand
round-trip + error discipline (the cli_e2e.rs flow at the CLI layer,
not just the socket layer) and the REPL loop over a piped stdin."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from walrus_spark.log import CommandServer, WalrusLog

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli(addr: str, *args: str, stdin: str | None = None):
    return subprocess.run(
        [sys.executable, "-m", "walrus_spark.cli", "--addr", addr, *args],
        capture_output=True,
        text=True,
        input=stdin,
        timeout=120,
        env=dict(os.environ, PYTHONPATH=_REPO),
        cwd=_REPO,
    )


def test_cli_subcommands_roundtrip_and_errors(spark, tmp_path):
    log = WalrusLog(spark, str(tmp_path / "cli"))
    server = CommandServer(log)
    host, port = server.start_background()
    addr = f"{host}:{port}"
    try:
        # unknown topic errors land on stderr with rc 1 (cli_e2e.rs:31)
        r = _cli(addr, "put", "missing", "payload")
        assert r.returncode == 1 and "unknown topic" in r.stderr

        assert _cli(addr, "register", "logs").returncode == 0
        # idempotent register (cli_e2e.rs:37-39)
        assert _cli(addr, "register", "logs").returncode == 0

        messages = ["one", "two", "three with spaces", "four", "five"]
        for m in messages:
            r = _cli(addr, "put", "logs", *m.split())
            assert r.returncode == 0, r.stderr
        for m in messages:
            r = _cli(addr, "get", "logs")
            assert r.returncode == 0 and r.stdout.strip() == m
        # drained → EMPTY (cli_e2e.rs:52)
        r = _cli(addr, "get", "logs")
        assert r.returncode == 0 and r.stdout.strip() == "EMPTY"

        # STATE and METRICS reply with JSON payloads (cli_e2e.rs:55-66)
        r = _cli(addr, "state", "logs")
        assert r.returncode == 0
        assert isinstance(json.loads(r.stdout), dict)
        r = _cli(addr, "metrics")
        assert r.returncode == 0
        assert isinstance(json.loads(r.stdout), dict)

        # connection refusal is a clean error, not a traceback
        r = _cli("127.0.0.1:1", "metrics")
        assert r.returncode == 1
        assert "connect" in r.stderr and "Traceback" not in r.stderr
    finally:
        server.shutdown()
        log.close()


def test_cli_repl_over_piped_stdin(spark, tmp_path):
    log = WalrusLog(spark, str(tmp_path / "repl"))
    server = CommandServer(log)
    host, port = server.start_background()
    addr = f"{host}:{port}"
    try:
        script = "\n".join(
            [
                "REGISTER t",
                "PUT t hello world",
                "GET t",
                "GET t",
                "BOGUS",
                "exit",
            ]
        )
        r = _cli(addr, stdin=script + "\n")
        assert r.returncode == 0, r.stderr
        # input() writes the prompt without a newline, so each reply
        # line arrives as "walrus> <reply>" under piped stdin
        cleaned = [
            ln.replace("walrus> ", "") for ln in r.stdout.splitlines()
        ]
        replies = [
            ln for ln in cleaned if ln.startswith(("OK", "EMPTY", "ERR"))
        ]
        assert replies == [
            "OK",
            "OK",
            "OK hello world",
            "EMPTY",
            "ERR unknown command",
        ]
    finally:
        server.shutdown()
        log.close()
