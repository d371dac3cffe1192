"""End-to-end query plans: the driver-facing query registry, the genmock
stats report, and the validate assertion suite."""
