"""Engine options (cudf.set_option parity, core/options.py shape).

One option matters at 100 TB: ``max_driver_rows``. The compat veneer
has a handful of deliberately driver-materializing ops (``to_pandas``,
``factorize``/``unique`` domain collects, ``argsort``) that are correct
and convenient at notebook scale but silently funnel the whole dataset
through the driver if pointed at a production table. With
``max_driver_rows`` set, every such op first checks the row count it is
about to materialize and raises with guidance instead of OOMing the
driver an hour into the job. Default None (off) keeps the
pandas-compat feel for small-data work.
"""

from __future__ import annotations

_OPTIONS: dict = {
    "max_driver_rows": None,
}


def set_option(name: str, value) -> None:
    if name not in _OPTIONS:
        raise KeyError(f"unknown option {name!r}; known: {sorted(_OPTIONS)}")
    _OPTIONS[name] = value


def get_option(name: str):
    if name not in _OPTIONS:
        raise KeyError(f"unknown option {name!r}; known: {sorted(_OPTIONS)}")
    return _OPTIONS[name]


def describe_option(name: str | None = None) -> dict:
    return dict(_OPTIONS) if name is None else {name: get_option(name)}


def check_driver_rows(sdf, op: str) -> None:
    """Raise if materializing ``sdf`` driver-side would exceed
    ``max_driver_rows`` (no-op when the option is unset). Costs one
    count() job when enabled — the debug-mode trade."""
    cap = get_option("max_driver_rows")
    if cap is None:
        return
    n = sdf.count()
    if n > cap:
        raise RuntimeError(
            f"{op} would materialize {n:,} rows on the driver "
            f"(max_driver_rows={cap:,}). Keep the computation distributed "
            "(write_parquet, registry queries, groupBy/window ops) or raise "
            "the cap via pygdf_spark.set_option('max_driver_rows', N)."
        )
