from psg_tpu.serve.generator import PokemonGenerator

__all__ = ["PokemonGenerator"]
