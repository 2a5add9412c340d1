"""Manifest data model: condition AST, pipeline/stage/transform configs."""

from etl_router_spark.model.conditions import Condition  # noqa: F401
from etl_router_spark.model.manifest import (  # noqa: F401
    Edge,
    FieldMapping,
    Pipeline,
    Stage,
    StageType,
)
