"""Custom TPU kernels (Pallas)."""
