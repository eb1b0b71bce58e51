"""Training-data pipeline (Spark, DuckDB-oracle) query pairs — aggregator.

Same contract as ``driver_queries``: each Spark callable has an ANSI-SQL twin
producing identical column names and (order-insensitive) values on the
driver's parquet tables. All hashing is engine-portable (md5 hex strings,
integer bit arithmetic), so even MinHash signatures and SimHash fingerprints
replay bit-for-bit in DuckDB.

The pairs themselves live in nine per-domain modules
(``driver_queries_td_{graph,ir,index,ann,tpch,events,text,stats,exp}``) with
cross-domain constants in ``driver_queries_td_shared``; this module is a
generated-style back-compat shim that re-exports every public binding of
those modules so historical ``from .driver_queries_td import X`` imports keep
working, and merges the per-module QUERIES/ORACLES dicts into
``QUERIES_TD``/``ORACLES_TD``.

Both merges fail loudly on a clash instead of silently shadowing: a duplicate
pair name across modules would otherwise drop one module's definition (the
same hazard ``driver_queries._merge_disjoint`` guards at the td/news/curation
level, which cannot see collisions *between* the td domain modules), and a
same-named but different-valued constant in two modules would desync oracle
SQL baked against one value from Spark code reading the other (invariant 8).
"""

from . import driver_queries_td_shared as _td_shared  # noqa: E402
from . import driver_queries_td_graph as _td_graph  # noqa: E402
from . import driver_queries_td_ir as _td_ir  # noqa: E402
from . import driver_queries_td_index as _td_index  # noqa: E402
from . import driver_queries_td_ann as _td_ann  # noqa: E402
from . import driver_queries_td_tpch as _td_tpch  # noqa: E402
from . import driver_queries_td_events as _td_events  # noqa: E402
from . import driver_queries_td_text as _td_text  # noqa: E402
from . import driver_queries_td_stats as _td_stats  # noqa: E402
from . import driver_queries_td_exp as _td_exp  # noqa: E402

_TD_MODULES = (
    _td_shared,
    _td_graph,
    _td_ir,
    _td_index,
    _td_ann,
    _td_tpch,
    _td_events,
    _td_text,
    _td_stats,
    _td_exp,
)

QUERIES_TD: dict = {}
ORACLES_TD: dict = {}


def _reexport() -> None:
    # Names a module merely imported from a sibling arrive as the *same*
    # object, so the identity check only trips on a genuine double
    # definition. QUERIES/ORACLES are per-module dicts, merged (disjointly)
    # below rather than re-exported.
    g = globals()
    pair_origin: dict = {}
    name_origin: dict = {}
    for mod in _TD_MODULES:
        tag = mod.__name__.rsplit("_", 1)[-1]
        for name, val in vars(mod).items():
            if name.startswith("__"):
                continue
            if name in ("QUERIES", "ORACLES"):
                clash = g[f"{name}_TD"].keys() & val.keys()
                if clash:
                    raise ValueError(
                        f"duplicate td pair names across domain modules "
                        f"({pair_origin.get(sorted(clash)[0], '?')} vs {tag}): "
                        f"{sorted(clash)}"
                    )
                g[f"{name}_TD"].update(val)
                pair_origin.update({k: tag for k in val})
                continue
            if name in name_origin and g.get(name) is not val:
                raise ValueError(
                    f"conflicting td module binding {name!r}: "
                    f"{name_origin[name]} vs {tag} (invariant 8)"
                )
            g[name] = val
            name_origin.setdefault(name, tag)


_reexport()
