"""Trajectory evaluation (ATE/RPE) and regression gates."""
