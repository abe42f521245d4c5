from codeps_tpu.config.node import ConfigNode
from codeps_tpu.config.defaults import get_cfg_defaults, get_cfg_defaults_adapt


def gen_config(filename: str | None = None, adapt: bool = False,
               freeze: bool = True) -> ConfigNode:
    """Build the run config: defaults merged with a YAML override file.

    Mirrors io_utils.gen_config (/root/reference/io_utils/io_utils.py:220-237):
    for adaptation configs, shared dataset params are copied into
    ``adapt.source_dataset`` after the merge.
    """
    cfg = get_cfg_defaults_adapt() if adapt else get_cfg_defaults()
    if filename is not None:
        cfg.merge_from_file(filename)
    if adapt:
        src = cfg.adapt.source_dataset
        shared = ["center_heatmap_sigma", "return_only_rgb",
                  "small_instance_area_full_res", "small_instance_weight",
                  "remove_classes", "label_mode", "augmentation",
                  "normalization"]
        for key in shared:
            src[key] = cfg.dataset[key]
    if freeze:
        cfg.freeze()
    return cfg


__all__ = ["ConfigNode", "get_cfg_defaults", "get_cfg_defaults_adapt",
           "gen_config"]
