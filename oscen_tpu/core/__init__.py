"""oscen_tpu.core"""
