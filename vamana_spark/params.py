"""Index parameters (reference: constructor scalars, vamana.h:19-39).

The reference keeps ``dimension, max_points, alpha, R, L, efSearch`` as
constructor scalars and a ``medoid`` computed at build. Here they are a
dataclass persisted to ``_meta.json`` next to the index Parquet dirs.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass
from typing import Optional


@dataclass
class VamanaParams:
    """Build/search parameters for a Vamana graph index.

    Mirrors the reference ctor (vamana.h:31-39) plus port-side extras:
    ``metric`` (the reference hard-codes squared L2 and leaves
    inner-product as a TODO, vamana.h:695) and ``seed`` (the reference is
    unseeded, vamana.h:121-122 — the port is deterministic by default).
    """

    dim: int
    max_points: int = 0  # 0 = unbounded (Spark has no fixed capacity)
    alpha: float = 1.2
    R: int = 32          # max out-degree
    L: int = 100         # build-time beam width
    ef_search: int = 100 # search-time beam width (ef = max(ef_search, k))
    metric: str = "l2sq" # l2sq | l2 | cosine | ip
    seed: int = 42
    medoid: Optional[int] = None  # internal ordinal of entry point; set at build
    mips_m: Optional[float] = None  # max data norm; set at build for metric="ip"
                                    # (MIPS->L2 augmentation constant)
    n: int = 0                    # point count; set at build
    num_shards: int = 1           # sharded-build fan-out used at build time
    shard_overlap: int = 2        # sharded build: centers each point joins
                                  # (DiskANN ell; 3 buys recall at ~1.5x
                                  # build compute — smaller shards + ell=3
                                  # beats fewer fat shards on both axes)

    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "VamanaParams":
        d = json.loads(s)
        return cls(**{k: v for k, v in d.items() if k in cls.__dataclass_fields__})

    def validate(self) -> None:
        if self.dim <= 0:
            raise ValueError(f"dim must be positive, got {self.dim}")
        if self.R <= 0 or self.L <= 0 or self.ef_search <= 0:
            raise ValueError("R, L, ef_search must be positive")
        if self.alpha < 1.0:
            raise ValueError(f"alpha must be >= 1.0, got {self.alpha}")
        if self.metric not in ("l2sq", "l2", "cosine", "ip"):
            raise ValueError(f"unknown metric {self.metric!r}")
        if self.shard_overlap < 1:
            raise ValueError(
                f"shard_overlap must be >= 1, got {self.shard_overlap}"
            )
