"""Env-driven pipeline configuration — the `run_maxwell.py` pattern.

The reference resolves every deployment knob from environment variables
with code defaults (run_maxwell.py: MYSQL_HOST/PORT, RABBITMQ_URI, ...).
Same idea here, retargeted at the Spark pipeline's knobs; `from_env()`
gives a complete config object that the CLI-less tests can also build
directly.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env(name: str, default: str) -> str:
    return os.environ.get(name, default)


@dataclass
class PipelineConfig:
    """Deployment knobs for the CDC pipeline + engine."""

    # transport (rabbitmq.go's connection block)
    bus_kind: str = "text"
    bus_path: str = "/data/maxwell_json"
    kafka_bootstrap: str = "localhost:9092"
    kafka_topic: str = "maxwell"

    # sinks (maxwell_gpdb.sql's archive + replica schemas)
    replica_path: str = "/data/replica"
    archive_path: str = "/data/archive"
    checkpoint_path: str = "/data/ckpt"
    fanout_paths: tuple[str, ...] = ()

    # engine sizing (SURVEY §6; set per-cluster)
    shuffle_partitions: int = 32
    max_partition_bytes: str = "128m"

    extra: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_env(cls) -> "PipelineConfig":
        """Resolve from CDC_* env vars with code defaults, like
        run_maxwell.py's os.environ.get chain."""
        fanout = _env("CDC_FANOUT_PATHS", "")
        return cls(
            bus_kind=_env("CDC_BUS_KIND", cls.bus_kind),
            bus_path=_env("CDC_BUS_PATH", cls.bus_path),
            kafka_bootstrap=_env("CDC_KAFKA_BOOTSTRAP", cls.kafka_bootstrap),
            kafka_topic=_env("CDC_KAFKA_TOPIC", cls.kafka_topic),
            replica_path=_env("CDC_REPLICA_PATH", cls.replica_path),
            archive_path=_env("CDC_ARCHIVE_PATH", cls.archive_path),
            checkpoint_path=_env("CDC_CHECKPOINT_PATH", cls.checkpoint_path),
            fanout_paths=tuple(p for p in fanout.split(",") if p),
            shuffle_partitions=int(_env("CDC_SHUFFLE_PARTITIONS", "32")),
            max_partition_bytes=_env("CDC_MAX_PARTITION_BYTES", "128m"),
        )

    def bus_opts(self) -> dict[str, str]:
        """kwargs for sources.bus.read_bus_stream."""
        if self.bus_kind == "text":
            return {"path": self.bus_path}
        if self.bus_kind == "kafka":
            return {
                "bootstrap_servers": self.kafka_bootstrap,
                "topic": self.kafka_topic,
            }
        return dict(self.extra)
