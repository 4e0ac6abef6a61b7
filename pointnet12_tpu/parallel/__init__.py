"""pointnet12_tpu.parallel"""
