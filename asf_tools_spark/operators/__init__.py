"""Distributed operators: spatial joins, tiling aggregates, EM classify,
labeling, flood estimation, compositing, dedup/similarity/text."""
