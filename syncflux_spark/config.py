"""TOML configuration file support (SURVEY §2.9 parity).

The reference loads a TOML config whose [General] block carries
per-action defaults, an [http] block configures the status API, and
repeated [[influxdb]] blocks name the candidate master/slave databases
(pkg/config/mainconfig.go:1-64; key names per conf/sample.syncflux.toml;
load precedence per pkg/main.go: explicit CLI flags > config file >
built-in defaults).

Spark-side mapping: an ``[[influxdb]]`` entry's ``location`` is a
warehouse root directory (a dir of ``{measurement}.parquet``) instead
of an HTTP endpoint; everything else keeps the reference's key names —
including the sample file's ``data-chuck-duration`` spelling, which is
accepted alongside the corrected ``data-chunk-duration``.

Python 3.11+ stdlib ``tomllib`` — no new dependency.
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass, field


@dataclass
class GeneralConfig:
    """[General] (mainconfig.go:8-26)."""

    instance_id: str = ""
    logdir: str = "./log"
    homedir: str = ""
    datadir: str = ""
    loglevel: str = "warn"
    sync_mode: str = "onlyslave"
    check_interval: str = "10s"
    min_sync_interval: str = "20s"
    master_db: str = ""
    slave_db: str = ""
    initial_replication: str = "none"
    monitor_retry_interval: str = "1m"
    data_chunk_duration: str = "5m"
    max_retention_interval: str = "8760h"
    rw_max_retries: int = 5
    rw_retry_delay: str = "10s"
    num_workers: int = 4
    max_points_on_single_write: int = 20000


@dataclass
class HTTPConfig:
    """[http] (mainconfig.go:39-44)."""

    name: str = ""
    bind_addr: str = "127.0.0.1:4090"
    admin_user: str = "admin"
    admin_password: str = "admin"
    cookie_id: str = "syncflux-cookie"

    @property
    def port(self) -> int:
        _, _, p = self.bind_addr.rpartition(":")
        return int(p) if p.isdigit() else 4090


@dataclass
class WarehouseConfig:
    """One [[influxdb]] entry (mainconfig.go:46-53); ``location`` is a
    parquet warehouse root here rather than an HTTP URL."""

    name: str = ""
    location: str = ""
    release: str = "parquet"
    admin_user: str = ""
    admin_password: str = ""
    timeout: str = "10s"


@dataclass
class Config:
    general: GeneralConfig = field(default_factory=GeneralConfig)
    http: HTTPConfig = field(default_factory=HTTPConfig)
    warehouses: list[WarehouseConfig] = field(default_factory=list)

    def warehouse(self, name: str) -> WarehouseConfig | None:
        for w in self.warehouses:
            if w.name == name:
                return w
        return None

    @property
    def master_location(self) -> str:
        w = self.warehouse(self.general.master_db)
        return w.location if w else ""

    @property
    def slave_location(self) -> str:
        w = self.warehouse(self.general.slave_db)
        return w.location if w else ""


#: TOML key → dataclass attribute (the reference's mapstructure tags).
_GENERAL_KEYS = {
    "instanceID": "instance_id",
    "logdir": "logdir",
    "homedir": "homedir",
    "datadir": "datadir",
    "loglevel": "loglevel",
    "sync-mode": "sync_mode",
    "check-interval": "check_interval",
    "min-sync-interval": "min_sync_interval",
    "master-db": "master_db",
    "slave-db": "slave_db",
    "initial-replication": "initial_replication",
    "monitor-retry-interval": "monitor_retry_interval",
    "data-chuck-duration": "data_chunk_duration",  # sic, reference key
    "data-chunk-duration": "data_chunk_duration",
    "max-retention-interval": "max_retention_interval",
    "rw-max-retries": "rw_max_retries",
    "rw-retry-delay": "rw_retry_delay",
    "num-workers": "num_workers",
    "max-points-on-single-write": "max_points_on_single_write",
}

_HTTP_KEYS = {
    "name": "name",
    "bind-addr": "bind_addr",
    "admin-user": "admin_user",
    "admin-passwd": "admin_password",
    "cookie-id": "cookie_id",
}

_WAREHOUSE_KEYS = {
    "name": "name",
    "location": "location",
    "release": "release",
    "admin-user": "admin_user",
    "admin-passwd": "admin_password",
    "timeout": "timeout",
}


def _apply(obj, data: dict, keymap: dict[str, str]) -> None:
    for k, attr in keymap.items():
        if k in data:
            setattr(obj, attr, data[k])


def load_config(path: str) -> Config:
    """Parse a reference-format TOML config. Unknown keys/sections are
    ignored (forward compatibility, matching viper's behavior);
    section names are matched case-insensitively ([General] in the
    sample, [general] also accepted)."""
    with open(path, "rb") as fh:
        raw = tomllib.load(fh)
    by_lower = {k.lower(): v for k, v in raw.items()}
    cfg = Config()
    _apply(cfg.general, by_lower.get("general", {}), _GENERAL_KEYS)
    _apply(cfg.http, by_lower.get("http", {}), _HTTP_KEYS)
    for entry in by_lower.get("influxdb", []):
        w = WarehouseConfig()
        _apply(w, entry, _WAREHOUSE_KEYS)
        cfg.warehouses.append(w)
    return cfg
