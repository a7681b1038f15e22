"""The reference's client text protocol, end to end.

distributed-walrus serves five text commands over length-prefixed TCP
frames (client.rs:28-118): REGISTER / PUT / GET / STATE / METRICS —
that protocol IS the reference's entire user-facing query surface, so
a user switching engines needs it to exist here verbatim. The Raft /
lease / multi-node plumbing behind the reference's controller is a
declared non-goal (SURVEY §4); this module keeps the WIRE CONTRACT —
command grammar, reply strings, framing, error texts — and binds it to
a local WalrusLog:

  REGISTER <topic>      -> "OK"              (implicit-create engine:
                                              ensure_topic analog)
  PUT <topic> <payload> -> "OK" | "ERR unknown topic ..." (payload =
                                              remainder of the line,
                                              spaces kept — splitn(3)
                                              in client.rs; the
                                              cluster surface requires
                                              REGISTER first,
                                              cli_e2e.rs:30-34)
  GET <topic>           -> "OK <payload>" | "EMPTY" (consumes, shared
                                              cursor — GET semantics)
  STATE <topic>         -> topic-state JSON | "ERR unknown topic ..."
  METRICS               -> engine metrics JSON
  anything else         -> "ERR unknown command"

Framing (serve()/CommandClient): 4-byte little-endian length + UTF-8
frame, 64 KiB max, "ERR invalid frame length" / "ERR invalid utf-8"
replies mirroring client.rs:40-53. The server is a stdlib threaded
socketserver — suitable for tests and local tooling; at scale the
driver process hosting the WalrusLog would host this listener too.
"""

from __future__ import annotations

import json
import socket
import socketserver
import threading

MAX_FRAME_LEN = 64 * 1024


class CommandShell:
    """Execute one reference-protocol command line against a WalrusLog."""

    def __init__(self, log) -> None:
        self.log = log

    def execute(self, line: str) -> str:
        try:
            # Reference dispatches on text.trim_end() (client.rs:55) —
            # ALL trailing whitespace stripped, including a PUT payload's
            # trailing spaces/tabs — not just the \r\n line ending.
            return self._dispatch(line.rstrip())
        except Exception as e:  # noqa: BLE001 — "ERR <e>" contract
            return f"ERR {e}"

    def _dispatch(self, line: str) -> str:
        parts = line.split(" ", 2)
        op = parts[0] if parts else ""
        if not op:
            # client.rs:66's splitn always yields a first element, so an
            # empty line reaches the catch-all: "ERR unknown command".
            raise ValueError("unknown command")
        if op == "REGISTER":
            if len(parts) < 2:
                raise ValueError("REGISTER requires a topic")
            self.log.ensure_topic(parts[1])
            return "OK"
        if op == "PUT":
            if len(parts) < 2:
                raise ValueError("PUT requires a topic")
            if len(parts) < 3:
                raise ValueError("PUT requires a payload")
            self._known(parts[1])
            self.log.append(parts[1], parts[2].encode("utf-8"))
            return "OK"
        if op == "GET":
            if len(parts) < 2:
                raise ValueError("GET requires a topic")
            self._known(parts[1])
            batch = self.log.batch_read(parts[1], max_entries=1)
            if not batch:
                return "EMPTY"
            return "OK " + batch[0].decode("utf-8", errors="replace")
        if op == "STATE":
            if len(parts) < 2:
                raise ValueError("STATE requires a topic")
            self._known(parts[1])
            return json.dumps(self.log.state(parts[1]), sort_keys=True)
        if op == "METRICS":
            return json.dumps(self.log.metrics(), sort_keys=True, default=str)
        raise ValueError("unknown command")

    def _known(self, topic: str) -> None:
        """The DISTRIBUTED surface requires REGISTER before use (the
        controller resolves topics through cluster metadata and errors
        with 'unknown topic'; cli_e2e.rs:30-34) — unlike the embedded
        library API, which keeps the core engine's implicit creation."""
        if not self.log.has_topic(topic):
            raise ValueError(f"unknown topic {topic}")


class _Handler(socketserver.BaseRequestHandler):
    def handle(self) -> None:  # one connection, many frames
        shell: CommandShell = self.server.shell  # type: ignore[attr-defined]
        sock = self.request
        while True:
            hdr = _read_exact(sock, 4)
            if hdr is None:
                return
            frame_len = int.from_bytes(hdr, "little")
            if frame_len == 0:  # no body, nothing to desync
                _send(sock, "ERR invalid frame length")
                continue
            if frame_len > MAX_FRAME_LEN:
                # DRAIN the oversized body before replying, or the next
                # header read would land mid-payload and desync every
                # later frame on this connection. (The reference replies
                # without draining, client.rs:40-44 — a latent desync we
                # deliberately do not mirror; capped so a hostile length
                # cannot force an unbounded read.)
                if frame_len <= 16 * MAX_FRAME_LEN:
                    if _read_exact(sock, frame_len) is None:
                        return
                    _send(sock, "ERR invalid frame length")
                    continue
                _send(sock, "ERR invalid frame length")
                return  # absurd length: close rather than desync
            body = _read_exact(sock, frame_len)
            if body is None:
                return
            try:
                text = body.decode("utf-8")
            except UnicodeDecodeError:
                _send(sock, "ERR invalid utf-8")
                continue
            _send(sock, shell.execute(text))


def _read_exact(sock: socket.socket, n: int) -> bytes | None:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


def _send(sock: socket.socket, message: str) -> None:
    data = message.encode("utf-8")
    sock.sendall(len(data).to_bytes(4, "little") + data)


class CommandServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, log, host: str = "127.0.0.1", port: int = 0) -> None:
        super().__init__((host, port), _Handler)
        self.shell = CommandShell(log)

    def start_background(self) -> tuple[str, int]:
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return self.server_address[0], self.server_address[1]


class CommandClient:
    """Length-prefixed framing client (what the reference CLI speaks)."""

    def __init__(self, host: str, port: int) -> None:
        self.sock = socket.create_connection((host, port))

    def send(self, line: str) -> str:
        _send(self.sock, line)
        return self._recv_reply()

    def send_raw(self, frame: bytes) -> str:
        self.sock.sendall(len(frame).to_bytes(4, "little") + frame)
        return self._recv_reply()

    def _recv_reply(self) -> str:
        # Explicit checks, not asserts: under `python -O` asserts are
        # stripped and a closed socket would surface as an unrelated
        # TypeError from int.from_bytes(None, ...).
        hdr = _read_exact(self.sock, 4)
        if hdr is None:
            raise ConnectionError("server closed connection")
        body = _read_exact(self.sock, int.from_bytes(hdr, "little"))
        if body is None:
            raise ConnectionError("server closed mid-frame")
        return body.decode("utf-8")

    def close(self) -> None:
        self.sock.close()
