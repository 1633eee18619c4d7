"""End-to-end demo scenarios (the reference's `demos/` scripts)."""
