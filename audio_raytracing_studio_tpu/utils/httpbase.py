"""Shared HTTP-server base for the two product servers.

Both the studio server (app/server.py) and the serving job API
(serving/service.py) sit on stdlib ``ThreadingHTTPServer``, whose default
``handle_error`` prints a full traceback to stderr every time a client
disconnects mid-response (BrokenPipeError / ConnectionResetError — e.g. a
browser cancelling a result download).  Under hostile or flaky clients that
is one 10-line stack dump per closed socket (observed from
tools/fuzz_campaign.py http mode).  Real handler bugs never reach
``handle_error`` — both products catch and map them to JSON error
responses inside the handler — so anything else is still reported.
"""

from __future__ import annotations

from http.server import ThreadingHTTPServer

# NOT TimeoutError: since 3.11 concurrent.futures.TimeoutError IS
# TimeoutError, and the job API's future.result(timeout=...) must never be
# silently classified as a disconnected client
_CLIENT_GONE = (BrokenPipeError, ConnectionResetError)


class QuietDisconnectHTTPServer(ThreadingHTTPServer):
    daemon_threads = True

    def handle_error(self, request, client_address):  # noqa: D102
        import sys

        exc = sys.exception()
        if isinstance(exc, _CLIENT_GONE):
            return  # the client hung up — not a server error
        super().handle_error(request, client_address)
