"""pointnet12_tpu.utils"""
