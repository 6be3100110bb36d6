"""Pipeline plans (stage graphs)."""
