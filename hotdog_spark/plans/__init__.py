"""Config → Catalyst plan compilation (the engine's analyzer/optimizer
front door; Catalyst does the actual optimization)."""
