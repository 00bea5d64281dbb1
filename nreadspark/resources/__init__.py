"""Package data for nreadspark (embedded assets)."""
