"""oscen_tpu.parallel"""
