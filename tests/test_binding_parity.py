"""Binding-surface parity regression: every public name the reference's
pybind modules expose must resolve somewhere in momentum_tpu.

The name lists below were extracted from the pybind sources
(pymomentum/*/**_pybind.cpp) during round 2's function-by-function sweep.
A name disappearing from our API breaks a pymomentum migration path — this
test pins the whole surface so that can't happen silently.
"""

import pytest


def _resolve(holders, name):
    return any(hasattr(h, name) for h in holders)


# ---- pymomentum.geometry module-level functions (geometry_pybind.cpp) ----

GEOMETRY_FUNCTIONS = [
    "apply_parameter_transform", "classify_triangles_by_texture",
    "compute_vertex_normals", "find_closest_points",
    "find_closest_points_on_mesh", "is_fbxsdk_available",
    "joint_parameters_to_local_skeleton_state", "joint_parameters_to_positions",
    "joint_parameters_to_skeleton_state", "load_markers",
    "load_markers_from_bytes", "load_motion",
    "local_skeleton_state_to_joint_parameters", "map_joint_parameters",
    "map_model_parameters", "model_parameters_to_blend_shape_coefficients",
    "model_parameters_to_face_expression_coefficients",
    "model_parameters_to_local_skeleton_state", "model_parameters_to_positions",
    "model_parameters_to_skeleton_state", "reduce_mesh_by_faces",
    "reduce_mesh_by_vertices", "reduce_to_selected_model_parameters",
    "replace_rest_mesh", "replace_skeleton_hierarchy",
    "skeleton_state_to_joint_parameters", "split_mesh_by_texture_region",
    "strip_joints", "strip_lower_body_vertices",
    "uniform_random_to_model_parameters",
]


@pytest.mark.parametrize("name", GEOMETRY_FUNCTIONS)
def test_geometry_function(name):
    import momentum_tpu.compat as compat

    assert hasattr(compat, name), f"compat lacks {name}"


# ---- Character members (character_pybind.cpp) ----

CHARACTER_MEMBERS = [
    "apply_model_param_limits", "bake_blend_shape", "bind_pose", "clone",
    "find_locators", "has_mesh", "joints_for_parameters",
    "load_fbx", "load_fbx_from_bytes", "load_fbx_with_motion",
    "load_fbx_with_motion_from_bytes", "load_gltf", "load_gltf_from_bytes",
    "load_gltf_with_motion", "load_gltf_with_motion_from_bytes",
    "load_gltf_with_skel_states", "load_gltf_with_skel_states_from_bytes",
    "load_legacy_json", "load_legacy_json_from_bytes",
    "load_legacy_json_from_string", "load_locators", "load_model_definition",
    "load_motion_timestamps", "load_urdf", "parameters_for_joints",
    "pose_mesh", "rebind_skin", "save", "save_fbx",
    "save_fbx_with_joint_params", "save_gltf", "save_gltf_from_skel_states",
    "save_legacy_json", "save_locators", "save_with_skel_states", "scaled",
    "simplify", "simplify_parameter_transform", "simplify_skeleton",
    "skel_states", "skin_points", "skin_skinned_locators", "to_gltf",
    "to_legacy_json_string", "transformed", "with_blend_shape",
    "with_collision_geometry", "with_face_expression_blend_shape",
    "with_locators", "with_mesh_and_skin_weights", "with_metadata",
    "with_name", "with_parameter_limits", "with_skinned_locators",
]


@pytest.mark.parametrize("name", CHARACTER_MEMBERS)
def test_character_member(name):
    from momentum_tpu.character import Character

    assert hasattr(Character, name), f"Character lacks {name}"


# ---- ParameterTransform / SkinWeights / Skeleton / Mesh members ----

PT_MEMBERS = [
    "all_parameters", "no_parameters", "apply", "blend_shape_parameters",
    "face_expression_parameters", "find_parameters", "inverse",
    "parameter_sets", "parameters_for_joints", "pose_parameters",
    "rigid_parameters", "scaling_parameters", "size", "add_parameter_set",
    "parameter_set",
]

SKIN_MEMBERS = ["to_dense", "from_dense", "normalize_weights",
                "max_influences_per_vertex", "num_vertices", "num_joints"]

SKELETON_MEMBERS = ["size", "joint_names", "joint_parents", "get_parent",
                    "get_child_joints", "is_ancestor", "upper_body_joints",
                    "offsets", "pre_rotations", "joint_index"]

MESH_MEMBERS = ["n_faces", "n_vertices", "with_updated_normals",
                "self_intersections"]


@pytest.mark.parametrize("name", PT_MEMBERS)
def test_parameter_transform_member(name):
    import dataclasses

    from momentum_tpu.character.parameter_transform import ParameterTransform

    field_names = {f.name for f in dataclasses.fields(ParameterTransform)}
    assert hasattr(ParameterTransform, name) or name in field_names


@pytest.mark.parametrize("name", SKIN_MEMBERS)
def test_skin_weights_member(name):
    from momentum_tpu.character.skinning import SkinWeights

    assert hasattr(SkinWeights, name)


@pytest.mark.parametrize("name", SKELETON_MEMBERS)
def test_skeleton_member(name):
    from momentum_tpu.character.skeleton import Skeleton

    assert hasattr(Skeleton, name)


@pytest.mark.parametrize("name", MESH_MEMBERS)
def test_mesh_member(name):
    from momentum_tpu.character.character import Mesh

    assert hasattr(Mesh, name)


# ---- Mppca / BlendShape class IO ----

def test_mppca_members():
    from momentum_tpu.errors.pose_prior import Mppca

    for n in ("get_mixture", "save", "to_bytes", "load", "from_bytes"):
        assert hasattr(Mppca, n), n


def test_blend_shape_members():
    from momentum_tpu.character.blend_shape import BlendShape

    for n in ("load", "from_bytes", "from_tensors", "save", "to_bytes"):
        assert hasattr(BlendShape, n), n


# ---- limits constructors (limit_pybind.cpp) ----

def test_limit_constructors():
    import momentum_tpu.character.limits as lim

    for n in ("create_minmax", "create_minmax_joint", "create_linear",
              "create_linear_joint", "create_halfplane", "create_ellipsoid"):
        assert hasattr(lim, n), n


# ---- camera (camera_pybind.cpp) ----

CAMERA_MEMBERS = ["clone", "crop", "downsample", "frame",
                  "get_intrinsic_parameters", "look_at", "project",
                  "project_intrinsics_jacobian", "resize",
                  "set_intrinsic_parameters", "unproject", "upsample"]


@pytest.mark.parametrize("name", CAMERA_MEMBERS)
def test_camera_member(name):
    from momentum_tpu.camera import Camera

    assert hasattr(Camera, name)


# ---- renderer (renderer_pybind.cpp) ----

RENDERER_FUNCTIONS = [
    "alpha_matte", "create_camera_for_body", "create_camera_for_hand",
    "create_index_buffer", "create_rgb_buffer",
    "create_shadow_projection_matrix", "create_z_buffer",
    "rasterize_camera_frustum", "rasterize_capsules", "rasterize_character",
    "rasterize_checkerboard", "rasterize_circles", "rasterize_circles_2d",
    "rasterize_cylinders", "rasterize_grid", "rasterize_lines",
    "rasterize_lines_2d", "rasterize_mesh", "rasterize_skeleton",
    "rasterize_spheres", "rasterize_text", "rasterize_text_2d",
    "rasterize_transforms", "rasterize_wireframe", "subdivide_mesh",
    "triangulate",
]


@pytest.mark.parametrize("name", RENDERER_FUNCTIONS)
def test_renderer_function(name):
    import momentum_tpu.rasterizer as R

    assert hasattr(R, name)


# ---- axel (axel_pybind.cpp) ----

AXEL_FUNCTIONS = [
    "mesh_to_sdf", "dual_contouring", "fill_holes", "smooth_mesh_laplacian",
    "load_sdf_from_msgpack", "save_sdf_to_msgpack", "load_sdfs_from_msgpack",
    "save_sdfs_to_msgpack", "triangulate_quads", "winding_number",
    "SignedDistanceField", "knn", "closest_point_on_mesh",
    "ray_mesh_intersect",
]

SDF_MEMBERS = ["sample", "sample_with_gradient", "gradient", "world_to_grid",
               "grid_to_world", "contains", "is_valid_index", "voxel_size",
               "bounds", "total_voxels", "resolution"]


@pytest.mark.parametrize("name", AXEL_FUNCTIONS)
def test_axel_function(name):
    import momentum_tpu.axel as ax

    assert hasattr(ax, name)


@pytest.mark.parametrize("name", SDF_MEMBERS)
def test_sdf_member(name):
    from momentum_tpu.axel import SignedDistanceField

    assert hasattr(SignedDistanceField, name)


# ---- solver module (solver_pybind.cpp) ----

SOLVER_FUNCTIONS = [
    "solve_ik", "residual", "gradient", "jacobian", "solve_sequence_ik",
    "transform_pose", "get_solve_ik_statistics", "reset_solve_ik_statistics",
    "get_gradient_statistics", "reset_gradient_statistics", "set_num_threads",
]


@pytest.mark.parametrize("name", SOLVER_FUNCTIONS)
def test_solver_function(name):
    import momentum_tpu.torch_interop as ti

    assert hasattr(ti, name)


# ---- marker_tracking (marker_tracking_pybind.cpp) ----

TRACKING_FUNCTIONS = [
    "calibrate_markers", "calibrate_locators", "calibrate_model",
    "process_markers", "process_marker_file", "refine_motion", "save_motion",
    "get_locator_error", "convert_locators_to_skinned_locators",
    "convert_skinned_locators_to_locators", "fill_marker_gaps",
]


@pytest.mark.parametrize("name", TRACKING_FUNCTIONS)
def test_tracking_function(name):
    import momentum_tpu.tracking as t

    assert hasattr(t, name)


# ---- io_usd (io_usd_pybind.cpp) ----

USD_FUNCTIONS = [
    "is_usd_available", "load_character", "load_character_from_bytes",
    "load_character_with_motion", "load_character_with_motion_from_bytes",
    "load_character_with_skel_states",
    "load_character_with_skel_states_from_bytes", "save_character",
    "save_character_from_skel_states",
]


@pytest.mark.parametrize("name", USD_FUNCTIONS)
def test_usd_function(name):
    import momentum_tpu.io.usd as usd

    assert hasattr(usd, name)


# ---- builders ----

def test_gltf_builder_members():
    from momentum_tpu.io import GltfBuilder

    for n in ("add_character", "add_mesh", "add_motion",
              "add_skeleton_states", "add_marker_sequence", "save",
              "to_bytes"):
        assert hasattr(GltfBuilder, n), n


def test_fbx_builder_members():
    from momentum_tpu.io import FbxBuilder

    for n in ("add_character", "add_motion", "add_motion_with_joint_params",
              "add_rigid_body", "add_animated_mesh", "add_marker_sequence",
              "save", "to_bytes"):
        assert hasattr(FbxBuilder, n), n


# ---- support contacts (support_contacts_pybind.cpp) ----

def test_support_contacts_functions():
    import momentum_tpu.character.support_contacts as sc
    from momentum_tpu.math import support_polygon as sp

    for n in ("support_contacts", "plane_collision_contacts_by_parent",
              "support_polygon"):
        assert hasattr(sc, n), n
    assert hasattr(sp, "support_polygon_from_world_points")


# ---- math modules (pymomentum skel_state / quaternion / trs) ----

QUATERNION_FUNCTIONS = [
    "check", "split", "multiply", "multiply_assume_normalized", "normalize",
    "conjugate", "inverse", "rotate_vector", "to_rotation_matrix", "identity",
    "from_axis_angle", "to_axis_angle", "euler_xyz_to_quaternion",
    "euler_zyx_to_quaternion", "from_rotation_matrix",
    "check_and_normalize_weights", "blend", "slerp", "from_two_vectors",
]

SKEL_STATE_FUNCTIONS = [
    "check", "split", "from_translation", "from_quaternion", "from_scale",
    "to_matrix", "multiply", "multiply_assume_normalized", "inverse",
    "transform_points", "transform_points_assume_normalized", "identity",
    "blend", "slerp", "from_matrix",
]


@pytest.mark.parametrize("name", QUATERNION_FUNCTIONS)
def test_quaternion_function(name):
    from momentum_tpu.math import quaternion as q

    assert hasattr(q, name)


@pytest.mark.parametrize("name", SKEL_STATE_FUNCTIONS)
def test_skel_state_function(name):
    from momentum_tpu.math import skel_state as ss

    assert hasattr(ss, name)
