"""Analytics solutions over predict/track results (reference
``ultralytics/solutions``)."""

from kuzu.solutions.solutions import (
    Analytics,
    Heatmap,
    ObjectCounter,
    QueueManager,
    Region,
    RegionCounter,
    SpeedEstimator,
    TrackZone,
    heatmap_accumulate,
)

__all__ = [
    "Analytics",
    "Heatmap",
    "ObjectCounter",
    "QueueManager",
    "Region",
    "RegionCounter",
    "SpeedEstimator",
    "TrackZone",
    "heatmap_accumulate",
]
