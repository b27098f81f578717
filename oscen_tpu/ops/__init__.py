"""oscen_tpu.ops"""
