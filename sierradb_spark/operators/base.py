"""Compatibility re-export: the registry primitives live at
``sierradb_spark.registry`` (a top-level module) so that a functions
module can be imported FIRST without running this package's
``__init__`` — which imports every functions module and would see the
one mid-import as partially initialized (the circular-import trap that
importing ``operators.base`` from a leaf module springs, because
importing a submodule always executes the parent package init)."""

from sierradb_spark.registry import Query, Registry, TABLES, load

__all__ = ["Query", "Registry", "TABLES", "load"]
