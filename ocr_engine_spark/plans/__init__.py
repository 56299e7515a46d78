"""Pipeline assembly."""
