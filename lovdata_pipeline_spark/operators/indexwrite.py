"""Shared partitioned-index writer: one data file per partition directory.

Every persisted, partition-pruned index in this engine (IVF cells for
ANN search, IVF cells for the k-NN graph, term-bucket postings) writes
`partitionBy(col)` parquet that a later query partition-prunes with an
`IN (<probed values>)` filter. Without a repartition ON the partition
column first, every partition directory collects one fragment per
upstream task — measured r10: 64 cells x 16 assign tasks = 1,024 files
for a 20k-row index, a listing/open-cost explosion at real scale. Hash
partitioning on the column makes each write task own whole partitions,
so each directory holds exactly one data file.

One implementation instead of three copies (r10 review): the next
index writer — or the next evolution of the discipline, e.g. splitting
oversized partitions on (col, pmod(hash(id), k)) like the chunk store
does — lands here once.
"""

from __future__ import annotations

import json as _json
import os as _os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_one_file_per_partition(
    df: DataFrame, path: str, partition_col: str, sidecar_name: str, sidecar: dict
) -> None:
    """Write ``df`` partitioned by ``partition_col`` with one data file
    per partition directory, plus a JSON sidecar describing the index.

    If a single partition outgrows a healthy file size, raise the
    partition count upstream or split on (col, pmod(hash(id), k)) —
    the chunk-store discipline.
    """
    df.repartition(F.col(partition_col)).write.mode("overwrite").partitionBy(
        partition_col
    ).parquet(path)
    with open(_os.path.join(path, sidecar_name), "w") as fh:
        _json.dump(sidecar, fh)
