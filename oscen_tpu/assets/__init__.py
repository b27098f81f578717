"""oscen_tpu.assets"""
