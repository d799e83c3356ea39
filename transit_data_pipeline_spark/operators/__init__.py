"""Query/operator library. Importing :mod:`.registry` and calling
``all_specs()`` loads every operator module and returns the registry."""
