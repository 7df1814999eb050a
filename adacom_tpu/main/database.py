"""Database instance (reference DuckDB/DatabaseInstance, src/main/database.cpp):
owns config, buffer manager, catalog, plan cache, profiler."""

from __future__ import annotations

import threading
from typing import Optional

from adacom_tpu.config import DBConfig
from adacom_tpu.catalog.catalog import Catalog
from adacom_tpu.storage.buffer import BufferManager


class Database:
    def __init__(self, path: Optional[str] = None, config: Optional[DBConfig] = None):
        # path: checkpoint directory for persistence (None = in-memory,
        # like the reference's :memory: mode used by all succinct benchmarks)
        self.path = path
        self.config = config or DBConfig()
        self.buffer_manager = BufferManager(self.config)
        self.catalog = Catalog(self.config, self.buffer_manager)
        # plan cache: template key -> (statements, bound plan, meta)
        self.plan_cache: dict = {}
        self.plan_cache_lock = threading.Lock()
        self._closed = False
        # frontload the (slow, once-per-process) device-link warmup so no
        # query ever pays it
        from adacom_tpu.utils.warmup import ensure_transfer_warm

        ensure_transfer_warm()
        if path is not None:
            from adacom_tpu.storage.checkpoint import try_load_database

            try_load_database(self, path)

    def connect(self) -> "Connection":
        from adacom_tpu.main.connection import Connection

        return Connection(self)

    def cursor(self) -> "Connection":
        return self.connect()

    def checkpoint(self) -> None:
        if self.path is not None:
            from adacom_tpu.storage.checkpoint import write_checkpoint

            write_checkpoint(self, self.path)

    def close(self) -> None:
        if self._closed:
            return
        self.catalog.shutdown()
        self._closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
