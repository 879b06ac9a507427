"""Column-level helpers and the driver-parity query registry."""
