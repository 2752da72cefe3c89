from psg_tpu.data.dataset import PokemonDataset, dataset_statistics, split_indices
from psg_tpu.data.loader import Loader, make_loaders

__all__ = [
    "PokemonDataset",
    "dataset_statistics",
    "split_indices",
    "Loader",
    "make_loaders",
]
