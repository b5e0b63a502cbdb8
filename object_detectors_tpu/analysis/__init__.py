"""Offline analysis tools: per-category mAP comparison tables, McNemar
statistical disagreement tests, k-means anchor estimation."""
