"""Frontier row model: lineage-stable sequence keys, parser registry."""
