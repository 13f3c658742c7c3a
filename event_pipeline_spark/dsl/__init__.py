from event_pipeline_spark.dsl.parser import parse
from event_pipeline_spark.dsl.ast import (
    BinOp,
    Conditional,
    Descriptor,
    Group,
    TaskRef,
)

__all__ = ["parse", "BinOp", "Conditional", "Descriptor", "Group", "TaskRef"]
