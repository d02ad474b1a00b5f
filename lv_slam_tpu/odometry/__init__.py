from lv_slam_tpu.odometry.dlo import DirectLidarOdometry  # noqa: F401
