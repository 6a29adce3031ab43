"""Operator-level shuffle sizing for iterative plans.

``tools/scale_conf.py`` derives CLUSTER-level confs (shuffle partitions
from scan bytes / 128 MB, broadcast budget from heap) once per job.
Iterative operators have a different failure mode: the driver loop
re-shuffles a frame that may be 30x larger than whatever the session
conf was sized for, and every round pays the spill tax. The round-4 30x
stress measured exactly this — ``dedup_components`` bent from 1.67 to
2.73 s/replica between 10x and 30x, and raising
``spark.sql.shuffle.partitions`` 32 -> 128 (same cores) cut the 30x
point 73.3s -> 60.0s and the marginal to 2.06 (PLANS.md, "30x scale
point, iterative-graph + Lloyd paths"). That lever was a manual env
override; this module makes the operators size it themselves from the
materialized input.

The derivation is row-based, not byte-based: the spill the stress
caught was sort/aggregation-buffer pressure in the per-round
join+groupBy, which tracks ROW count of the shuffled frame (payload-free
(bigint, bigint) edges), while the in-flight byte volume was only a few
hundred MB. ``TARGET_ROWS_PER_PARTITION`` is calibrated against that
measurement: the 30x edge frame (~4M rows) sizes to >= 128 partitions
on 32 cores — the setting the measurement validated — while the 1x
bench frame stays at the session default (the sizing never shrinks the
session conf, so a cluster already sized by scale_conf is untouched).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Per-partition row budget for payload-light iterative shuffles
# ((bigint, bigint) edges, (bigint, bigint) label frames). Calibrated:
# 30x stress edges / 25k rows, rounded to full 32-core waves -> >= 128
# partitions, the measured spill-removing setting.
TARGET_ROWS_PER_PARTITION = 25_000

# Same scheduler-pressure cap as tools/scale_conf.py.
MAX_SHUFFLE_PARTITIONS = 131_072


def iterative_shuffle_partitions(spark: SparkSession, n_rows: int) -> int:
    """Shuffle-partition count for a driver-loop operator whose rounds
    shuffle ~``n_rows`` payload-light rows.

    Monotone w.r.t. the session: returns at least the current
    ``spark.sql.shuffle.partitions`` (never downsizes a cluster conf
    that scale_conf already sized), rounds up to a full wave of
    ``defaultParallelism`` cores, and caps at the scheduler-pressure
    limit. AQE coalesces the tail, so erring high is cheap; erring low
    spills (the round-4 measurement).
    """
    cores = max(1, spark.sparkContext.defaultParallelism)
    current = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    raw = (n_rows + TARGET_ROWS_PER_PARTITION - 1) // TARGET_ROWS_PER_PARTITION
    waves = ((raw + cores - 1) // cores) * cores
    return max(current, min(MAX_SHUFFLE_PARTITIONS, waves))


class sized_shuffle:
    """Context manager: pin ``spark.sql.shuffle.partitions`` to a value
    sized for an iterative loop, restore the session conf on exit.

    Spark reads the conf when each job RUNS, not when the plan is built
    — so every round inside the ``with`` block must be materialized
    (eager localCheckpoint / action) before exit, and any LAZY result
    returned to the caller must be materialized inside the window too,
    or its final job silently runs at the old sizing. The graph
    operators checkpoint their final round exactly when the sizing
    actually changed the conf for this reason.
    """

    def __init__(self, spark: SparkSession, n_rows: int):
        self.spark = spark
        self.parts = iterative_shuffle_partitions(spark, n_rows)
        self._prev: str | None = None

    @property
    def changed(self) -> bool:
        return self._prev is not None and int(self._prev) != self.parts

    def __enter__(self) -> "sized_shuffle":
        self._prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.parts))
        return self

    def __exit__(self, *exc) -> None:
        self.spark.conf.set("spark.sql.shuffle.partitions", self._prev)
