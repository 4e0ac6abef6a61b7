"""pointnet12_tpu.data"""
