"""HTTP status API — endpoint parity with the reference's webui
(SURVEY §2.8, pkg/webui/api.go + webserver.go):

- ``GET  /api/health/``      → JSON ClusterStatus (api.go:16,24-28)
- ``GET  /api/health/<id>``  → stub "hola" (api.go:17,47-51)
- ``POST /api/action/<id>``  → auth'd stub "hola" (api.go:18,54-61)
- ``GET  /api/queryactive``  → names of alive nodes (api.go:19,30-45)
- ``POST /login`` / ``/logout`` → session-cookie auth vs configured
  admin user/password (webserver.go:173-208; config
  pkg/config/mainconfig.go:39-44)

Stdlib ``http.server`` on a driver thread — zero dependencies, no
data-plane involvement. Cookie-session auth is deliberately minimal
(matches the reference's memory-session scheme, websession.go).
"""

from __future__ import annotations

import json
import secrets
import threading
from dataclasses import asdict
from datetime import datetime
from enum import Enum
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from syncflux_spark.streaming.monitor import HAMonitor


def _jsonable(obj):
    if isinstance(obj, Enum):
        return obj.value
    if isinstance(obj, datetime):
        return obj.isoformat()
    raise TypeError(type(obj))


class StatusServer:
    """Embeds the status API around an :class:`HAMonitor`."""

    def __init__(
        self,
        monitor: HAMonitor,
        node_names: dict[str, str] | None = None,
        admin_user: str = "admin",
        admin_passwd: str = "admin",
        host: str = "127.0.0.1",
        port: int = 4090,
    ):
        self.monitor = monitor
        self.node_names = node_names or {"master": "master", "slave": "slave"}
        self.admin_user = admin_user
        self.admin_passwd = admin_passwd
        self.host = host
        self.port = port
        self._sessions: set[str] = set()
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -- handlers -----------------------------------------------------------
    def _handler_cls(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence request logging
                pass

            def _send(self, code: int, payload, content_type="application/json"):
                body = (
                    json.dumps(payload, default=_jsonable)
                    if content_type == "application/json"
                    else payload
                ).encode()
                self.send_response(code)
                self.send_header("Content-Type", content_type)
                self.send_header("Content-Length", str(len(body)))
                for h, v in getattr(self, "_extra_headers", []):
                    self.send_header(h, v)
                self.end_headers()
                self.wfile.write(body)

            def _authed(self) -> bool:
                cookie = self.headers.get("Cookie", "")
                return any(
                    c.strip().removeprefix("syncflux-sess=") in server._sessions
                    for c in cookie.split(";")
                    if c.strip().startswith("syncflux-sess=")
                )

            def do_GET(self):
                if self.path == "/api/health/" or self.path == "/api/health":
                    st = server.monitor.get_status()
                    self._send(200, asdict(st))
                elif self.path.startswith("/api/health/"):
                    self._send(200, "hola", "text/plain")  # api.go:47-51 stub
                elif self.path == "/api/queryactive":
                    st = server.monitor.get_status()
                    alive = []
                    if st.master_state:
                        alive.append(server.node_names["master"])
                    if st.slave_state:
                        alive.append(server.node_names["slave"])
                    self._send(200, alive)
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                if self.path == "/login":
                    n = int(self.headers.get("Content-Length", 0))
                    try:
                        creds = json.loads(self.rfile.read(n) or b"{}")
                    except json.JSONDecodeError:
                        self._send(400, {"error": "bad json"})
                        return
                    if (
                        creds.get("username") == server.admin_user
                        and creds.get("password") == server.admin_passwd
                    ):
                        tok = secrets.token_hex(16)
                        server._sessions.add(tok)
                        self._extra_headers = [
                            ("Set-Cookie", f"syncflux-sess={tok}; HttpOnly")
                        ]
                        self._send(200, {"message": "ok"})
                    else:
                        self._send(401, {"error": "bad credentials"})
                elif self.path == "/logout":
                    cookie = self.headers.get("Cookie", "")
                    for c in cookie.split(";"):
                        c = c.strip()
                        if c.startswith("syncflux-sess="):
                            server._sessions.discard(c.removeprefix("syncflux-sess="))
                    self._send(200, {"message": "bye"})
                elif self.path.startswith("/api/action/"):
                    if not self._authed():
                        self._send(401, {"error": "auth required"})
                    else:
                        self._send(200, "hola", "text/plain")  # api.go:54-61 stub
                else:
                    self._send(404, {"error": "not found"})

        return Handler

    # -- lifecycle ----------------------------------------------------------
    def start(self) -> int:
        """Bind + serve on a daemon thread; returns the bound port
        (``port=0`` picks a free one — handy in tests)."""
        self._httpd = ThreadingHTTPServer((self.host, self.port), self._handler_cls())
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True, name="status-api"
        )
        self._thread.start()
        return self.port

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
