"""DataFrame→DataFrame operators (the engine's physical-strategy layer)."""
