from super_resolution_tpu.models.rrdb import RRDBNet, RRDB, DenseBlock  # noqa: F401
from super_resolution_tpu.models.discriminator import Discriminator  # noqa: F401
from super_resolution_tpu.models.vgg import VGGFeatures, load_vgg_params  # noqa: F401
