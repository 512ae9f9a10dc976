"""map_batches / actor-pool stages of the KG construction pipeline."""
