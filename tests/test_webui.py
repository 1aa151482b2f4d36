"""Status API endpoint parity tests (SURVEY §2.8)."""

from __future__ import annotations

import json
import urllib.request

import pytest

from syncflux_spark.streaming.monitor import HAMonitor
from syncflux_spark.webui import StatusServer


@pytest.fixture()
def server():
    slave_alive = {"v": True}
    monitor = HAMonitor(
        master_probe=lambda: True, slave_probe=lambda: slave_alive["v"]
    )
    monitor.check_once()
    srv = StatusServer(monitor, port=0, admin_user="admin", admin_passwd="pw")
    port = srv.start()
    yield srv, port, slave_alive, monitor
    srv.stop()


def _get(port, path, headers=None):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}", headers=headers or {})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read().decode(), dict(r.headers)
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode(), dict(e.headers)


def _post(port, path, payload=None, headers=None):
    data = json.dumps(payload).encode() if payload is not None else b""
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=data, headers=headers or {}
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read().decode(), dict(r.headers)
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode(), dict(e.headers)


class TestEndpoints:
    def test_health(self, server):
        _, port, _, _ = server
        code, body, _ = _get(port, "/api/health/")
        assert code == 200
        st = json.loads(body)
        assert st["cluster_state"] == "OK"
        assert st["master_state"] is True

    def test_health_id_stub(self, server):
        _, port, _, _ = server
        code, body, _ = _get(port, "/api/health/42")
        assert (code, body) == (200, "hola")  # api.go:47-51 parity

    def test_queryactive_reflects_liveness(self, server):
        _, port, slave_alive, monitor = server
        code, body, _ = _get(port, "/api/queryactive")
        assert code == 200 and json.loads(body) == ["master", "slave"]
        slave_alive["v"] = False
        monitor.check_once()
        _, body, _ = _get(port, "/api/queryactive")
        assert json.loads(body) == ["master"]

    def test_action_requires_auth(self, server):
        _, port, _, _ = server
        code, _, _ = _post(port, "/api/action/1")
        assert code == 401
        # login → cookie → authorized
        code, _, headers = _post(
            port, "/login", {"username": "admin", "password": "pw"}
        )
        assert code == 200
        cookie = headers["Set-Cookie"].split(";")[0]
        code, body, _ = _post(port, "/api/action/1", headers={"Cookie": cookie})
        assert (code, body) == (200, "hola")
        # logout invalidates
        _post(port, "/logout", headers={"Cookie": cookie})
        code, _, _ = _post(port, "/api/action/1", headers={"Cookie": cookie})
        assert code == 401

    def test_bad_login(self, server):
        _, port, _, _ = server
        code, _, _ = _post(port, "/login", {"username": "admin", "password": "no"})
        assert code == 401

    def test_404(self, server):
        _, port, _, _ = server
        code, _, _ = _get(port, "/nope")
        assert code == 404
