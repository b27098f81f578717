"""oscen_tpu.graph"""
