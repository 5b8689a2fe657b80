from . import geometry, knn, hist, icp, segments, cluster  # noqa: F401
