"""CLI entry modules (console scripts dcae-train / dcae-eval / dcae-codec;
runnable directly as ``python tools/<name>.py`` too)."""
