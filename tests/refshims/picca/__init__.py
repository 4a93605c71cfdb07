"""picca shim (see README.md)."""
