from mlrsketch.verbs import exact, sketch  # noqa: F401
