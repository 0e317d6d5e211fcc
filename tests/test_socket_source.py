"""§2.A4: the socket text stream, driven END-TO-END against a real TCP
server (r8). The row was carried as 'adapter shipped, env-blocked: no
live socket peer' since round 1 — but the peer doesn't need to be
external: Spark's socket source is a CLIENT, so a localhost listener
inside the test process is a faithful peer. One value:string column,
no replay, no exactly-once — the demo/debug source contract, asserted
against the exact lines the server wrote.
"""

from __future__ import annotations

import socket
import socketserver
import threading
import time
import uuid

LINES = [f"line-{i:03d}" for i in range(20)]


class _Handler(socketserver.BaseRequestHandler):
    def handle(self):
        self.request.sendall(("\n".join(LINES) + "\n").encode())
        # hold the connection open until the test shuts the server down —
        # a closed socket ends the stream mid-query
        while not getattr(self.server, "_test_done", False):
            time.sleep(0.1)


def test_socket_stream_end_to_end(spark):
    from flink_quickstart_spark.sources.files import socket_stream

    server = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _Handler)
    server.daemon_threads = True
    host, port = server.server_address
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    name = f"sock_{uuid.uuid4().hex[:8]}"
    q = None
    try:
        stream = socket_stream(spark, host, port)
        assert stream.isStreaming and stream.columns == ["value"]
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .trigger(processingTime="500 milliseconds")
            .start()
        )
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql(f"SELECT count(*) FROM {name}").first()[0] >= len(LINES):
                break
            time.sleep(0.5)
        got = [r.value for r in spark.sql(f"SELECT value FROM {name}").collect()]
        assert sorted(got) == LINES, f"socket stream delivered {len(got)} rows"
    finally:
        if q is not None:
            q.stop()
        server._test_done = True
        server.shutdown()
        server.server_close()


def test_socket_stream_connection_refused_is_loud(spark):
    """A dead peer must fail the QUERY loudly (no silent empty stream):
    the socket source raises on connect at stream start."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from flink_quickstart_spark.sources.files import socket_stream

    # grab a port that nothing listens on
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    _, port = s.getsockname()
    s.close()
    import pytest

    name = f"sock_{uuid.uuid4().hex[:8]}"
    q = socket_stream(spark, "127.0.0.1", port).writeStream.format("memory").queryName(name).start()
    with pytest.raises(StreamingQueryException):
        q.awaitTermination(30)
