from .lpips import LPIPS, load_lpips_params
