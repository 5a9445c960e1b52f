"""Generate a ResnetFC weight+IO parity fixture from the reference.

Instantiates the reference's ``resnet_block_fc.ResnetFC`` (torch, importable
without timm) at the renderer's config (models.py:144-145), records its
random-init weights and the output on fixed inputs. The JAX test maps the
weights into our Flax ``ResnetFC`` and asserts matching outputs — proving
decoder weight-convertibility.
"""

import pathlib
import sys

import numpy as np

REFERENCE = '/root/reference'
OUT = pathlib.Path(__file__).parent / 'fixtures' / 'resnetfc_golden.npz'


def main():
    sys.path.insert(0, REFERENCE)
    import torch
    from resnet_block_fc import ResnetFC

    torch.manual_seed(0)
    d_in, d_latent, d_hidden, n_blocks = 18, 576, 128, 3
    net = ResnetFC(d_in, d_out=3, n_blocks=n_blocks, d_latent=d_latent,
                   d_hidden=d_hidden).double().eval()

    rng = np.random.default_rng(1)
    zx = rng.normal(0, 1, (4, 50, d_latent + d_in))
    with torch.no_grad():
        out = net(torch.tensor(zx)).numpy()

    fix = {'zx': zx, 'out': out}
    for name, p in net.state_dict().items():
        fix['w_' + name.replace('.', '_')] = p.numpy()
    OUT.parent.mkdir(exist_ok=True)
    np.savez_compressed(OUT, **fix)
    print('wrote', OUT)


if __name__ == '__main__':
    main()
