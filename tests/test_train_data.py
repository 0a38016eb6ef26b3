"""Streaming training input pipeline (sdtpu.train.data).

VERDICT r2 task 3: sharded readers with epoch semantics, background device
prefetch, and the on-device VAE-encode-from-images path. CPU backend, TINY.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.config import TINY
from sdtpu.train.data import (
    ImageFolderSource,
    NpzShardSource,
    Prefetcher,
    batches,
    make_dataset,
    stream,
)


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    """3 shards of different sizes; every example carries a unique id in
    latents[0,0,0] so coverage is checkable."""
    d = tmp_path_factory.mktemp("shards")
    s = TINY.latent_size
    uid = 0
    for si, n in enumerate([5, 3, 4]):
        lat = np.zeros((n, s, s, TINY.latent_channels), np.float32)
        for i in range(n):
            lat[i] = uid
            uid += 1
        tok = np.tile(np.arange(TINY.clip.context_len, dtype=np.int32)[None],
                      (n, 1))
        np.savez(d / f"shard{si}.npz", latents=lat, tokens=tok)
    return d, uid  # uid == total examples (12)


def _ids(batch_list):
    out = []
    for b in batch_list:
        out.extend(np.asarray(b["latents"])[:, 0, 0, 0].astype(int).tolist())
    return out


def test_epoch_visits_every_example_once(shard_dir):
    d, total = shard_dir
    src = NpzShardSource(d)
    assert len(src) == total
    got = _ids(list(batches(src, 2, epoch=0, seed=0)))
    assert sorted(got) == list(range(total))

    # deterministic per (seed, epoch); different across epochs
    again = _ids(list(batches(src, 2, epoch=0, seed=0)))
    assert got == again
    other = _ids(list(batches(src, 2, epoch=1, seed=0)))
    assert sorted(other) == list(range(total)) and other != got
    # unshuffled order is sequential
    plain = _ids(list(batches(src, 2, epoch=0, seed=0, shuffle=False)))
    assert plain == list(range(total))


def test_partial_batches_and_drop_last(shard_dir):
    d, total = shard_dir
    src = NpzShardSource(d)
    full = list(batches(src, 5, epoch=0, seed=1, drop_last=False))
    assert sum(b["latents"].shape[0] for b in full) == total
    dropped = list(batches(src, 5, epoch=0, seed=1, drop_last=True))
    assert all(b["latents"].shape[0] == 5 for b in dropped)


def test_prefetcher_matches_sync_iteration(shard_dir):
    d, total = shard_dir
    src = NpzShardSource(d)
    sync = list(batches(src, 3, epoch=0, seed=2))
    pre = list(Prefetcher(batches(src, 3, epoch=0, seed=2), depth=2))
    assert len(pre) == len(sync)
    for a, b in zip(sync, pre):
        # prefetched batches are device-resident jax arrays
        assert isinstance(b["latents"], jax.Array)
        np.testing.assert_array_equal(a["latents"], np.asarray(b["latents"]))
        np.testing.assert_array_equal(a["tokens"], np.asarray(b["tokens"]))


def test_prefetcher_propagates_errors():
    def bad():
        yield {"x": np.zeros(2)}
        raise RuntimeError("shard corrupted")

    it = Prefetcher(bad(), depth=2)
    next(it)
    with pytest.raises(RuntimeError, match="shard corrupted"):
        next(it)


def test_stream_epochs_roll_over(shard_dir):
    d, total = shard_dir
    src = NpzShardSource(d)
    per_epoch = total // 4
    it = stream(src, 4, seed=3, epochs=2, prefetch=0)
    got = list(it)
    assert len(got) == 2 * per_epoch
    # and the infinite stream keeps going past one epoch
    inf = stream(src, 4, seed=3, prefetch=2)
    for _ in range(per_epoch + 2):
        next(inf)


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    size = TINY.image_size
    rng = np.random.default_rng(0)
    lines = []
    for i in range(5):
        arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"im{i}.png")
        lines.append(f"im{i}.png\ta tiny test image number {i}")
    # one differently-sized image exercises resize+crop
    arr = rng.integers(0, 256, (size * 2, size * 3, 3), dtype=np.uint8)
    from PIL import Image as I

    I.fromarray(arr).save(d / "big.png")
    lines.append("big.png\tthe big one")
    (d / "captions.txt").write_text("\n".join(lines) + "\n")
    return d


def test_image_folder_source(image_dir):
    from sdtpu.engine.context import DEMO_MERGES
    from sdtpu.tokenizer import Tokenizer

    tok = Tokenizer.from_merges(DEMO_MERGES)
    src = make_dataset(image_dir, tokenizer=tok,
                       context_len=TINY.clip.context_len,
                       image_size=TINY.image_size)
    assert isinstance(src, ImageFolderSource) and len(src) == 6
    bs = list(batches(src, 3, epoch=0, seed=0))
    assert len(bs) == 2
    b = bs[0]
    s = TINY.image_size
    assert b["images"].shape == (3, s, s, 3)
    assert b["images"].dtype == np.float32
    assert float(np.abs(b["images"]).max()) <= 1.0
    assert b["tokens"].shape == (3, TINY.clip.context_len)


def test_ldm_loss_images_path_matches_manual_encode(image_dir):
    """The on-device encode path must equal feeding the posterior sample
    (drawn with the loss's own sub-key) through the latents path."""
    from sdtpu.engine.context import DEMO_MERGES
    from sdtpu.models import clip, temb, unet, vae
    from sdtpu.tokenizer import Tokenizer
    from sdtpu.train import ldm_loss

    key0 = jax.random.PRNGKey(0)
    ku, kc, kt, kv = jax.random.split(key0, 4)
    unet_params = unet.init(ku, TINY.unet, zero_init_outs=False)
    frozen = {"clip": clip.init(kc, TINY.clip),
              "temb": temb.init(kt, TINY.unet),
              "vae_enc": vae.init_encoder(kv, TINY.vae)}

    tok = Tokenizer.from_merges(DEMO_MERGES)
    src = make_dataset(image_dir, tokenizer=tok,
                       context_len=TINY.clip.context_len,
                       image_size=TINY.image_size)
    batch = next(batches(src, 2, epoch=0, seed=0))

    key = jax.random.PRNGKey(7)
    loss_img = ldm_loss(unet_params, frozen, batch, key, TINY)
    assert np.isfinite(float(loss_img))

    # manual encode with the same posterior sub-key
    _, _, kp = jax.random.split(key, 3)
    mean, logvar = vae.apply_encoder(
        frozen["vae_enc"], jnp.asarray(batch["images"]), TINY.vae)
    lat = (mean.astype(jnp.float32)
           + jnp.exp(0.5 * logvar.astype(jnp.float32))
           * jax.random.normal(kp, mean.shape, jnp.float32))
    loss_lat = ldm_loss(unet_params, frozen,
                        {"latents": lat, "tokens": batch["tokens"]},
                        key, TINY)
    np.testing.assert_allclose(float(loss_img), float(loss_lat),
                               rtol=1e-5, atol=1e-6)


def test_cli_train_streaming(shard_dir, image_dir, tmp_path, capsys):
    """`sdtpu train --data <dir>` streams shards; image folders train via
    the on-device encode path."""
    from sdtpu.cli import main

    d, _ = shard_dir
    out = tmp_path / "ck_stream"
    assert main(["train", "--config", "tiny", "--steps", "3", "--batch", "2",
                 "--data", str(d), "--log-every", "1",
                 "--out", str(out), "--platform", "cpu"]) == 0
    cap = capsys.readouterr().out
    assert "dataset: 12 examples (latents)" in cap
    assert "saved train state (step 3)" in cap

    out2 = tmp_path / "ck_img"
    assert main(["train", "--config", "tiny", "--steps", "2", "--batch", "2",
                 "--data", str(image_dir), "--log-every", "1",
                 "--out", str(out2), "--platform", "cpu"]) == 0
    cap = capsys.readouterr().out
    assert "dataset: 6 examples (images)" in cap
    assert "saved train state (step 2)" in cap
