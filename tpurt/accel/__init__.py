from tpurt.accel.clusters import ClusterSet, build_clusters
from tpurt.accel.grid import GridSet, build_grid

__all__ = ["ClusterSet", "build_clusters", "GridSet", "build_grid"]
