"""Registry for the generic relational operators."""

from kg_covid_19_ray.pipelines.relational import (
    BRAND_MARGIN_SQL,
    EVENTS_HOURLY_SQL,
    NATION_YEAR_REVENUE_SQL,
    PRICING_SUMMARY_SQL,
    REGION_REVENUE_SQL,
    RETURNED_TOPK_SQL,
    TOP_NATIONS_SQL,
    brand_margin,
    events_hourly,
    nation_year_revenue,
    pricing_summary,
    region_revenue,
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
    "rel_region_revenue": (region_revenue, REGION_REVENUE_SQL),
    "rel_brand_margin": (brand_margin, BRAND_MARGIN_SQL),
}
