"""Operator library: tag/map semantics, relational helpers, top-k, set ops."""
