"""EventResult schema + ResultSet: a DataFrame with set-on-id semantics.

Re-expresses the reference's result model (nexus/result.py:21-102) and
``ResultSet`` (result.py:162-467) on Spark. The reference keeps results in
a dict keyed on ``id`` (insertion-ordered, driver-memory-bound); here a
ResultSet wraps a DataFrame deduplicated on ``id``, so it scales past
driver memory and joins/unions stay distributed.

Ordering divergence (SURVEY §7 hard parts): the reference's ``first()`` /
indexing rely on Python insertion order. Spark DataFrames are unordered,
so positional access is defined by the explicit total order
``(creation_time, id)``.
"""

from __future__ import annotations

import uuid
from typing import Any

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from event_pipeline_spark.core.lookup import compile_filters


class MultiValueError(ValueError):
    """More than one row matched a get() that requires exactly one."""


#: Framework-owned columns of an event result (nexus/result.py:21-31).
#: ``content`` is Any in the reference; we keep a JSON string column
#: (parse with from_json when the event declares a schema) — SURVEY §1.2.
EVENT_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("error", T.BooleanType(), False),
        T.StructField("event_name", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("task_id", T.StringType(), True),
        T.StructField("init_params", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("call_params", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("process_id", T.LongType(), True),
        T.StructField("creation_time", T.TimestampType(), False),
    ]
)

def _order():
    return [F.col("creation_time").asc(), F.col("id").asc()]


def make_result_row(
    event_name: str,
    content: str | None,
    *,
    error: bool = False,
    task_id: str | None = None,
    init_params: dict[str, str] | None = None,
    call_params: dict[str, str] | None = None,
    process_id: int | None = None,
    creation_time=None,
    id: str | None = None,
) -> Row:
    import datetime as _dt

    return Row(
        id=id or uuid.uuid4().hex,
        error=error,
        event_name=event_name,
        content=content,
        task_id=task_id,
        init_params=init_params,
        call_params=call_params,
        process_id=process_id,
        creation_time=creation_time or _dt.datetime.now(_dt.timezone.utc),
    )


class ResultSet:
    """Set-of-results keyed by ``id`` with the reference's query surface.

    All operations are lazy DataFrame transformations except the ones the
    reference defines as materializing (len, get, first, indexing).
    """

    def __init__(self, df: DataFrame, *, deduped: bool = False) -> None:
        if "id" not in df.columns:
            raise ValueError("ResultSet requires an 'id' column")
        self.df = df if deduped else df.dropDuplicates(["id"])

    @classmethod
    def from_rows(cls, spark: SparkSession, rows: list[Row]) -> "ResultSet":
        return cls(spark.createDataFrame(rows, schema=EVENT_RESULT_SCHEMA))

    # -- set protocol (reference result.py:180-245) ---------------------

    def add(self, other: "ResultSet | DataFrame") -> "ResultSet":
        """Union + dedup-on-id merge (result.py:210-221). Last-writer-wins
        on id collisions is approximated by keeping an arbitrary row, as
        dropDuplicates does; the reference overwrites with the newcomer."""
        other_df = other.df if isinstance(other, ResultSet) else other
        return ResultSet(self.df.unionByName(other_df, allowMissingColumns=True))

    def discard(self, other: "ResultSet | DataFrame") -> "ResultSet":
        """Remove by id — left anti join (result.py:228-238)."""
        other_df = other.df if isinstance(other, ResultSet) else other
        return ResultSet(
            self.df.join(other_df.select("id"), "id", "left_anti"), deduped=True
        )

    def contains_id(self, id_: str) -> bool:
        """Membership by id (result.py:188-191)."""
        return self.df.where(F.col("id") == id_).limit(1).count() > 0

    def count(self) -> int:
        return self.df.count()

    def __len__(self) -> int:  # materializing, like the reference
        return self.count()

    # -- query DSL (result.py:261-454) ----------------------------------

    def filter(self, **filters: Any) -> "ResultSet":
        return ResultSet(
            self.df.where(compile_filters(self.df.schema, **filters)),
            deduped=True,
        )

    def get(self, **filters: Any) -> Row:
        """Exactly-one semantics (result.py:247-259)."""
        rows = self.filter(**filters).df.limit(2).collect()
        if not rows:
            raise KeyError(f"No result found matching filters: {filters}")
        if len(rows) > 1:
            raise MultiValueError(f"More than one result for filters {filters}")
        return rows[0]

    def filter_by_event(self, event_name: str) -> "ResultSet":
        """Case-insensitive event-name select (nexus/task.py:590-603)."""
        return ResultSet(
            self.df.where(F.lower(F.col("event_name")) == event_name.lower()),
            deduped=True,
        )

    # -- ordered access (explicit order; divergence documented above) ---

    def first(self) -> Row | None:
        rows = self.df.orderBy(*_order()).limit(1).collect()
        return rows[0] if rows else None

    def __getitem__(self, index: int) -> Row:
        if index < 0:
            raise IndexError("negative indexing not supported on ResultSet")
        rows = self.df.orderBy(*_order()).offset(index).limit(1).collect()
        if not rows:
            raise IndexError(index)
        return rows[0]

    def copy(self) -> "ResultSet":
        return ResultSet(self.df, deduped=True)

    def __repr__(self) -> str:
        return f"<ResultSet: lazy over {len(self.df.columns)} columns>"
