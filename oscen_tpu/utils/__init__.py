"""oscen_tpu.utils"""
