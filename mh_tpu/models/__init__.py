"""Model families: the furniture/scene layout target and generic densities."""
