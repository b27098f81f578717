"""oscen_tpu.models — example synth configurations (the reference's examples/)."""
