"""Data layer: COCO/LVIS loaders, transforms, synthetic datasets, idf
statistics."""
