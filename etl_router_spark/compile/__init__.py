"""Compilers: condition AST -> Column, transforms -> DataFrame ops, DAG -> plan."""

from etl_router_spark.compile.conditions import compile_condition  # noqa: F401
