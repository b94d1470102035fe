"""Driver-side request-parameter parsing — SURVEY.md §2.2 F6.

The reference parses year specs from HTTP params
(`malaria_api_calculator_etl_view.py:642-683`,
`weather_data_prec_temp_etl_view.py:795-828`,
`app/etl_app/utils/validators.py:18-32`): '2021-2023' → range,
'2021,2022' → list, 'all' → everything available, with a
requested-minus-available validation (U3). Pure Python — this runs
on the driver before any Spark plan is built, and its output feeds
``col("year").isin(...)`` / partition pruning.
"""

from __future__ import annotations

YEAR_MIN, YEAR_MAX = 2015, 2030  # health_center_mongodb_service.py bounds


class YearSpecError(ValueError):
    pass


def parse_year_spec(spec: str | None, available: list[int]) -> list[int]:
    """Parse a year spec against the available set; returns the sorted
    selection. Raises YearSpecError with the unavailable years (U3 set
    difference) if the request exceeds what exists."""
    avail = sorted(set(available))
    if spec is None or str(spec).strip().lower() in ("", "all"):
        return avail
    s = str(spec).strip()
    try:
        if "-" in s and "," not in s:
            lo_s, hi_s = s.split("-", 1)
            lo, hi = int(lo_s), int(hi_s)
            if lo > hi:
                raise YearSpecError(f"invalid range {s!r}: start > end")
            requested = list(range(lo, hi + 1))
        elif "," in s:
            requested = [int(p.strip()) for p in s.split(",") if p.strip()]
        else:
            requested = [int(s)]
    except ValueError as e:
        raise YearSpecError(f"unparseable year spec {s!r}") from e
    for y in requested:
        if not (YEAR_MIN <= y <= YEAR_MAX):
            raise YearSpecError(f"year {y} outside {YEAR_MIN}..{YEAR_MAX}")
    missing = sorted(set(requested) - set(avail))
    if missing:
        raise YearSpecError(f"years not available: {missing}")
    return sorted(set(requested))
