"""Registry for the generic relational operators."""

from kg_covid_19_ray.pipelines.relational import (
    EVENTS_HOURLY_SQL,
    NATION_YEAR_REVENUE_SQL,
    PRICING_SUMMARY_SQL,
    RETURNED_TOPK_SQL,
    TOP_NATIONS_SQL,
    events_hourly,
    nation_year_revenue,
    pricing_summary,
    returned_topk,
    top_nations,
)

REGISTRY = {
    "rel_pricing_summary": (pricing_summary, PRICING_SUMMARY_SQL),
    "rel_top_nations": (top_nations, TOP_NATIONS_SQL),
    "rel_returned_topk": (returned_topk, RETURNED_TOPK_SQL),
    "rel_events_hourly": (events_hourly, EVENTS_HOURLY_SQL),
    "rel_nation_year_revenue": (nation_year_revenue,
                                NATION_YEAR_REVENUE_SQL),
}
