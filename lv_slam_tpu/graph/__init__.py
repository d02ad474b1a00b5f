from lv_slam_tpu.graph.pose_graph import PoseGraph, optimize_pose_graph  # noqa: F401
from lv_slam_tpu.graph.keyframe import KeyFrame, KeyframeUpdater  # noqa: F401
