"""Codec families (geometry: octree/trisoup/predictive; attributes:
RAHT/predicting/lifting/raw) and the point-set data model."""
