import os

from imgcomp_cvpr_tpu.utils import logdir


def test_create_and_recover(tmp_path):
    # Fake config roots mirroring the package layout.
    ae_root = tmp_path / 'cfg' / 'ae'
    pc_root = tmp_path / 'cfg' / 'pc'
    (ae_root / 'cvpr').mkdir(parents=True)
    (pc_root / 'cvpr').mkdir(parents=True)
    (ae_root / 'cvpr' / 'low').write_text('x = 1\n')
    (pc_root / 'cvpr' / 'res_shallow').write_text('y = 2\n')

    root = str(tmp_path / 'logs')
    d = logdir.create_unique_log_dir(['cvpr/low', 'cvpr/res_shallow'], root)
    assert os.path.isdir(d)
    base = os.path.basename(d)
    date, ae_comp, pc_comp = base.split(' ')
    assert logdir.is_log_date(date)
    assert ae_comp == 'cvpr@low'
    assert pc_comp == 'cvpr@res_shallow'

    ae_p, pc_p = logdir.config_paths_from_log_dir(d, [str(ae_root), str(pc_root)])
    assert ae_p.endswith('cvpr/low') and pc_p.endswith('cvpr/res_shallow')


def test_unique_dirs_same_minute(tmp_path):
    root = str(tmp_path / 'logs')
    d1 = logdir.create_unique_log_dir(['a'], root)
    d2 = logdir.create_unique_log_dir(['a'], root)
    assert d1 != d2


def test_dash_mangling(tmp_path):
    ae_root = tmp_path / 'ae'
    ae_root.mkdir()
    (ae_root / 'lr1e-5').write_text('x=1\n')
    root = str(tmp_path / 'logs')
    d = logdir.create_unique_log_dir(['lr1e-5'], root)
    assert 'lr1e*5' in os.path.basename(d)
    (p,) = logdir.config_paths_from_log_dir(d, [str(ae_root)])
    assert p.endswith('lr1e-5')


def test_iter_ckpt_dirs(tmp_path):
    root = tmp_path / 'logs'
    d = logdir.create_unique_log_dir(['a', 'b'], str(root))
    ckpts = logdir.ckpt_dir_for_log_dir(d)
    os.makedirs(ckpts)
    job_id = logdir.log_date_from_log_dir(d)
    found = list(logdir.iter_ckpt_dirs(str(root), job_id))
    assert found == [ckpts]
    assert logdir.log_dir_from_ckpt_dir(ckpts) == d


def test_restore_suffix(tmp_path):
    root = str(tmp_path / 'logs')
    d1 = logdir.create_unique_log_dir(['a'], root)
    d2 = logdir.create_unique_log_dir(['a'], root, restore_dir=d1)
    assert 'RESTORE@' in os.path.basename(d2)
    # RESTORE component must be ignored when recovering configs
    ae_root = tmp_path / 'ae'
    ae_root.mkdir()
    (ae_root / 'a').write_text('x=1\n')
    (p,) = logdir.config_paths_from_log_dir(d2, [str(ae_root)])
    assert p.endswith('a')
