"""Token-level constants shared across the data pipeline and the model.

Mirrors the contract of the reference implementation
(/root/reference/llava/constants.py:7-14): the multimodal splice protocol
places a sentinel id in the token stream wherever per-frame visual tokens
must be inserted, and masks loss with IGNORE_INDEX.
"""

CONTROLLER_HEART_BEAT_EXPIRATION = 30
WORKER_HEART_BEAT_INTERVAL = 15

LOGDIR = "."

# Model / splice constants
IGNORE_INDEX = -100
IMAGE_TOKEN_INDEX = -200
DEFAULT_IMAGE_TOKEN = "<image>"
DEFAULT_IMAGE_PATCH_TOKEN = "<im_patch>"
DEFAULT_IM_START_TOKEN = "<im_start>"
DEFAULT_IM_END_TOKEN = "<im_end>"
IMAGE_PLACEHOLDER = "<image-placeholder>"
GROUND_TOKEN = "<ground>"
COORD_TOKEN = "<coord>"
