"""walrus-cli analog: the reference's user-facing command-line client
(distributed-walrus/src/bin/walrus-cli.rs + cli_client.rs), re-hosted
over this engine's wire protocol.

Same surface: `--addr` target (default 127.0.0.1:9091, the reference's
default client listener), subcommands REGISTER/PUT/GET/STATE/METRICS,
and an interactive REPL when no subcommand is given (walrus-cli.rs:56
`Command::Repl` default). GET prints the payload or "EMPTY"
(walrus-cli.rs:61-64); errors go to stderr with exit code 1.

One addition the reference keeps in its node binary instead: `serve`
hosts the wire protocol over a local WalrusLog (the single-node analog
of main.rs:153-157's client listener) so the whole loop —
`serve` in one terminal, `put/get` in another — runs against this
engine alone. Only `serve` imports Spark; client commands are
socket-only.

Connection strategy divergence (observable only in timing): the
reference CLI dials a fresh TCP connection per command
(cli_client.rs:44-52); the REPL here keeps one connection, and on a
mid-command connection loss reports the failure WITHOUT resending
(the server replies after commit, so a blind retry could duplicate a
PUT) and re-dials for the next command. The framed protocol is
identical either way.

Usage:
  python -m walrus_spark.cli [--addr HOST:PORT] register <topic>
  python -m walrus_spark.cli put <topic> <payload...>
  python -m walrus_spark.cli get <topic>
  python -m walrus_spark.cli state <topic>
  python -m walrus_spark.cli metrics
  python -m walrus_spark.cli            # REPL
  python -m walrus_spark.cli serve --root DIR [--listen HOST:PORT]
"""

from __future__ import annotations

import argparse
import sys


def _parse_addr(addr: str) -> tuple[str, int]:
    host, _, port = addr.rpartition(":")
    if not host or not port.isdigit():
        raise SystemExit(f"invalid --addr {addr!r}; expected HOST:PORT")
    return host, int(port)


def _client(addr: str):
    from walrus_spark.log.commands import CommandClient

    host, port = _parse_addr(addr)
    try:
        return CommandClient(host, port)
    except OSError as e:
        raise SystemExit(f"connect to {addr}: {e}") from e


def _one_shot(addr: str, line: str, *, print_ok: bool = False) -> int:
    """Send one command; reference CLI exit discipline: ERR → stderr +
    rc 1, GET's EMPTY prints as-is, payload replies print raw."""
    c = _client(addr)
    try:
        reply = c.send(line)
    finally:
        c.close()
    if reply.startswith("ERR"):
        print(reply, file=sys.stderr)
        return 1
    if reply.startswith("OK "):
        print(reply[3:])
    elif reply == "OK":
        if print_ok:
            print("OK")
    else:
        print(reply)  # EMPTY / STATE json / METRICS json
    return 0


def _repl(addr: str) -> int:
    print(f"connected target: {addr}")
    print(
        "type commands (REGISTER/PUT/GET/STATE/METRICS). "
        "'exit' or Ctrl+D to quit."
    )
    client = _client(addr)
    try:
        while True:
            try:
                line = input("walrus> ")
            except EOFError:
                return 0
            except KeyboardInterrupt:
                return 0
            t = line.strip()
            if not t:
                continue
            if t.lower() in ("exit", "quit"):
                return 0
            try:
                print(client.send(line))
            except (ConnectionError, OSError) as e:
                # The target went away mid-command. Do NOT resend: the
                # server may have committed a PUT before the connection
                # died (reply-after-commit), so a blind retry would
                # duplicate the entry. Report, re-dial for the NEXT
                # command, and let the user decide.
                print(
                    f"connection lost ({e}); command NOT retried — "
                    "verify with GET/STATE before re-issuing writes",
                    file=sys.stderr,
                )
                try:
                    client.close()
                except OSError:
                    pass
                try:
                    client = _client(addr)
                except SystemExit as e2:
                    print(e2, file=sys.stderr)
                    return 1
    finally:
        try:
            client.close()
        except OSError:
            pass


def _serve(root: str, listen: str) -> int:
    from pyspark.sql import SparkSession

    from walrus_spark.log import CommandServer, WalrusLog
    from walrus_spark.session import apply_runtime_confs

    host, port = _parse_addr(listen)
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.ui.enabled", "false")
        .appName("walrus-serve")
        .getOrCreate()
    )
    apply_runtime_confs(spark)
    log = WalrusLog(spark, root)
    server = CommandServer(log, host=host, port=port)
    bound_host, bound_port = server.start_background()
    print(f"serving {root} on {bound_host}:{bound_port}", flush=True)
    try:
        import threading

        threading.Event().wait()  # serve until interrupted
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        log.close()
        spark.stop()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="walrus-cli", description=__doc__.splitlines()[0]
    )
    p.add_argument("--addr", default="127.0.0.1:9091")
    sub = p.add_subparsers(dest="cmd")
    s = sub.add_parser("register")
    s.add_argument("topic")
    s = sub.add_parser("put")
    s.add_argument("topic")
    s.add_argument("data", nargs="+")
    s = sub.add_parser("get")
    s.add_argument("topic")
    s = sub.add_parser("state")
    s.add_argument("topic")
    sub.add_parser("metrics")
    sub.add_parser("repl")
    s = sub.add_parser("serve")
    s.add_argument("--root", required=True)
    s.add_argument("--listen", default="127.0.0.1:9091")
    a = p.parse_args(argv)

    if a.cmd == "register":
        return _one_shot(a.addr, f"REGISTER {a.topic}", print_ok=True)
    if a.cmd == "put":
        return _one_shot(
            a.addr, f"PUT {a.topic} {' '.join(a.data)}", print_ok=True
        )
    if a.cmd == "get":
        return _one_shot(a.addr, f"GET {a.topic}")
    if a.cmd == "state":
        return _one_shot(a.addr, f"STATE {a.topic}")
    if a.cmd == "metrics":
        return _one_shot(a.addr, "METRICS")
    if a.cmd == "serve":
        return _serve(a.root, a.listen)
    return _repl(a.addr)  # default, like the reference (walrus-cli.rs:56)


if __name__ == "__main__":
    sys.exit(main())
