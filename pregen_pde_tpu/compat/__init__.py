"""Reference-checkpoint migration (torch state_dict → flax params).

Lets a user of the reference repo bring TRAINED weights into this framework:

    import torch, numpy as np
    from pregen_pde_tpu.compat import import_scot_state_dict

    sd = {k: v.cpu().numpy() for k, v in torch.load("ckpt.pt").items()}
    params = import_scot_state_dict(sd, config)   # drop-in flax params

The mappings are the ones pinned by the cross-implementation oracle tests
(`tests/test_reference_oracle.py`), which transplant randomly-initialized
reference weights and verify forward-output equality — so an imported
checkpoint computes the same function here that it computed in the reference
(to f32 roundoff). No torch dependency: inputs are plain numpy mappings.
"""

from pregen_pde_tpu.compat.torch_import import (
    import_cno_state_dict,
    import_ffno_state_dict,
    import_fno_state_dict,
    import_scot_state_dict,
)

__all__ = [
    "import_cno_state_dict",
    "import_ffno_state_dict",
    "import_fno_state_dict",
    "import_scot_state_dict",
]
