"""Serving API: checkpoint -> InstanceSegmenter -> batched predictions."""

import numpy as np
import jax
import pytest

from rec_attend_tpu import config
from rec_attend_tpu import serving
from rec_attend_tpu.models import full_model


@pytest.fixture(scope='module')
def segmenter(tmp_path_factory):
  tmp = tmp_path_factory.mktemp('serve')
  cfg = config.tiny_full_config(timespan=4, inp_height=32, inp_width=32,
                                filter_height=8, filter_width=8)
  params = full_model.init_full_model(jax.random.PRNGKey(0), cfg)
  folder = str(tmp / 'full_model_test')
  from rec_attend_tpu.engine.saver import Saver
  saver = Saver(folder, model_opt=cfg)
  saver.save({'params': params}, 3)
  return serving.InstanceSegmenter.from_checkpoint(folder, remove_tiny=0)


def test_predict_shapes(segmenter):
  imgs = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
  out = segmenter.predict(imgs)
  assert out['masks'].shape == (2, 4, 32, 32)
  assert out['masks'].dtype == np.uint8
  assert out['scores'].shape == (2, 4)
  assert out['counts'].shape == (2,)
  assert set(np.unique(out['masks'])) <= {0, 1}


def test_predict_resizes_arbitrary_inputs(segmenter):
  imgs = (np.random.RandomState(1).rand(1, 48, 56, 3) * 255).astype(
      np.uint8)
  out = segmenter.predict(imgs)
  # full-size output matches the caller's resolution
  assert out['masks'].shape == (1, 4, 48, 56)


def test_predict_single_image_rank3(segmenter):
  img = np.random.RandomState(2).rand(32, 32, 3).astype(np.float32)
  out = segmenter.predict(img, full_size=False)
  assert out['masks'].shape == (1, 4, 32, 32)
