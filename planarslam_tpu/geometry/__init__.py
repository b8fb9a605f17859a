from planarslam_tpu.geometry import se3, sim3, plane  # noqa: F401
