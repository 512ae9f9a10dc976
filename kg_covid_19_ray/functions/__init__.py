"""Pure, vectorizable scalar/array functions used inside map_batches stages."""
