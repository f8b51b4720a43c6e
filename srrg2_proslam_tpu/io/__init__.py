"""Dataset readers, image loading, calibration, trajectory export."""
