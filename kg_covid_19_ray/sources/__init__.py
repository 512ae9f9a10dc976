"""Sources: page-table synthesis and static side tables (gazetteer, maps)."""
