"""Pure-numpy geometry kernels (no Ray imports).

Everything here is written from scratch because shapely / h3 / geopandas
are unavailable in this environment — and the engine is a re-expression,
not a port. Each kernel is vectorized so Ray Data ``map_batches`` stages
can call it on whole Arrow batches.
"""
