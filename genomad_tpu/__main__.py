"""``python -m genomad_tpu`` runs the CLI."""

from genomad_tpu.cli import cli

if __name__ == "__main__":
    cli()
