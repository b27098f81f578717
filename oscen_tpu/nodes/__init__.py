"""oscen_tpu.nodes"""
