"""pointnet12_tpu.cli"""
