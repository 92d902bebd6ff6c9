"""Ray Data stage builders — each takes/returns ``ray.data.Dataset``."""
