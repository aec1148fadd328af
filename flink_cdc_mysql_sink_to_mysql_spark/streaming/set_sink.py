"""Lifecycle-managed, chunk-batched external id-set sink (K2 + K3).

The reference sinks cohort member-id lists into a Redis set through a
`RichSinkFunction` holding a Lettuce connection — open
(UserGroupClickHouseJob.java:160-169), per-call `SADD` of ≤10,000-id
chunks produced by the `Split` pre-sink (`:144-151`, SADD `:172-174`),
close (`:176-187`). The Spark-native shape of "rich sink with
lifecycle" is a per-partition writer: each partition opens ONE client,
streams its rows through in bounded chunks, and closes the client when
the partition is exhausted — here as a `mapInPandas` stage (Arrow
batches in, never per-row Python) whose generator body IS the
open/process/close lifecycle, followed by a tiny summary aggregation
that forces execution and reports rows written.

Delivery: at-least-once per partition-attempt (Spark may re-run a
failed/speculated task), made effective-exactly-once by the store's
set semantics — SADD is idempotent, exactly the property the reference
relies on. Chunking bounds per-call payload (K3), not correctness.

No external store exists in-sandbox, so :class:`FakeSetStore` stands in:
a directory of append-only chunk files (one per SADD call — safe under
concurrent writers, like a network call per chunk) plus a per-client
meta file recording the open→close lifecycle, which the tests assert.
Swapping in a real client (redis.Redis, a JDBC pool, ...) changes only
``_connect``; the partition-writer shape is the production one.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHUNK = 10_000  # reference payload bound, UserGroupClickHouseJob.java:147


class FakeSetStoreClient:
    """Stand-in for a Redis/Lettuce connection (one per partition).

    Each ``sadd`` is one "network call": an atomic write of one chunk
    file. ``close`` commits a meta file with the call log — a client
    that never closes leaves no meta, which the lifecycle test catches.
    """

    def __init__(self, root: str):
        self.root = root
        self.client_id = uuid.uuid4().hex
        self.calls: list[int] = []
        self.closed = False
        os.makedirs(root, exist_ok=True)

    def sadd(self, key: str, ids: list) -> int:
        if self.closed:
            raise RuntimeError("sadd after close")
        d = os.path.join(self.root, key)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"{self.client_id}-{len(self.calls)}.json")
        with open(path, "w") as f:
            json.dump(ids, f)
        self.calls.append(len(ids))
        return len(ids)

    def close(self) -> None:
        self.closed = True
        with open(
            os.path.join(self.root, f"_client-{self.client_id}.meta.json"), "w"
        ) as f:
            json.dump({"closed": True, "chunk_sizes": self.calls}, f)


class FakeSetStore:
    """Driver-side reader of the fake store (the 'redis-cli' end)."""

    def __init__(self, root: str):
        self.root = root

    def members(self, key: str) -> set:
        d = os.path.join(self.root, key)
        out: set = set()
        if not os.path.isdir(d):
            return out
        for name in os.listdir(d):
            with open(os.path.join(d, name)) as f:
                out.update(json.load(f))
        return out  # set semantics ⇒ replays/retries are invisible

    def client_metas(self) -> list[dict]:
        return [
            json.load(open(os.path.join(self.root, n)))
            for n in os.listdir(self.root)
            if n.startswith("_client-")
        ]


def _partition_writer(
    connect: Callable[[], FakeSetStoreClient], key: str, chunk_size: int
):
    def write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = connect()  # open — once per partition (:160-169)
        n = 0
        try:
            for pdf in batches:
                ids = pdf.iloc[:, 0]
                # K3 chunking: bound every call's payload (:144-151)
                for lo in range(0, len(ids), chunk_size):
                    n += client.sadd(key, ids.iloc[lo : lo + chunk_size].tolist())
            yield pd.DataFrame({"written": [n]})
        finally:
            client.close()  # close — even on failure (:176-187)

    return write


def sadd_sink(
    ids: DataFrame,
    store_root: str,
    key: str,
    chunk_size: int = CHUNK,
) -> int:
    """Write a one-column id DataFrame into set ``key`` of the store at
    ``store_root``; returns ids written (pre-dedup, like SADD's arity).

    One client per partition; per-call payload ≤ chunk_size. The summary
    aggregation forces the lazy mapInPandas stage distributively — no
    driver-side id handling at any scale.
    """
    if len(ids.columns) != 1:
        raise ValueError(f"expected a single id column, got {ids.columns}")
    out = ids.mapInPandas(
        _partition_writer(lambda: FakeSetStoreClient(store_root), key, chunk_size),
        schema="written long",
    )
    row = out.agg(F.sum("written").alias("n")).collect()[0]
    return int(row.n or 0)
