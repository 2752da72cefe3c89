from psg_tpu.utils.images import save_image_grid, tensor_to_pil
from psg_tpu.utils.seed import set_seed

__all__ = ["save_image_grid", "tensor_to_pil", "set_seed"]
