"""pointnet12_tpu.train"""
