"""HintSet registry: the discrete plan-space levers LimeQO explores.

The reference's 49 hint columns are on/off combinations of join/scan operator
families fed to PostgreSQL (SURVEY §2B intro; README.md:11 of the reference).
Spark's levers are session confs + per-join hints; a HintSet here is an
immutable set of conf overrides plus an optional join-strategy hint applied
to every join in the query (the reference's hints are likewise query-global
knob combos, not per-operator pins — the algorithm is knob-agnostic).

Registry = {broadcast allowed | forbidden} x {prefer sort-merge | shuffle
hash} x {AQE on | off} x {CBO on | off} = 16 sets, hint 0 = all defaults
(FIXTURES.md §4).
"""

from __future__ import annotations

from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class HintSet:
    hint_id: int
    name: str
    confs: dict[str, str] = field(default_factory=dict)
    join_hint: str | None = None  # BROADCAST | MERGE | SHUFFLE_HASH | SHUFFLE_REPLICATE_NL

    def apply_join_hint(self, df: DataFrame) -> DataFrame:
        return df.hint(self.join_hint) if self.join_hint else df


def build_registry() -> list[HintSet]:
    sets: list[HintSet] = [HintSet(0, "default")]
    hid = 1
    for bcast in (True, False):
        for smj in (True, False):
            for aqe in (True, False):
                for cbo in (True, False):
                    if bcast and smj and aqe and cbo:
                        continue  # ~= default; keep ids dense anyway
                    confs = {
                        "spark.sql.autoBroadcastJoinThreshold": "10485760" if bcast else "-1",
                        "spark.sql.join.preferSortMergeJoin": str(smj).lower(),
                        "spark.sql.adaptive.enabled": str(aqe).lower(),
                        "spark.sql.cbo.enabled": str(cbo).lower(),
                    }
                    name = (
                        f"bcast={'on' if bcast else 'off'},smj={'on' if smj else 'off'},"
                        f"aqe={'on' if aqe else 'off'},cbo={'on' if cbo else 'off'}"
                    )
                    sets.append(HintSet(hid, name, confs))
                    hid += 1
    return sets


REGISTRY: list[HintSet] = build_registry()


@contextmanager
def applied(spark: SparkSession, hint_set: HintSet):
    """Apply a HintSet's conf overrides, restoring prior values on exit."""
    saved: dict[str, str | None] = {}
    for k, v in hint_set.confs.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        yield hint_set
    finally:
        for k, old in saved.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)
