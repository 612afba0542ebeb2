# Demo-input registry for the Gradio app / CLIs — parity with the
# reference's configs/prompts/test_cases.py (a dict keyed by GPU rank,
# mapping reference image -> list of pose videos).
TestCasesDict = {
    0: [
        {
            "./configs/inference/ref_images/Aragaki.png": [
                "./configs/inference/pose_videos/Aragaki_pose.mp4",
                "./configs/inference/pose_videos/solo_pose.mp4",
            ]
        },
        {
            "./configs/inference/ref_images/solo.png": [
                "./configs/inference/pose_videos/solo_pose.mp4",
                "./configs/inference/pose_videos/Aragaki_pose.mp4",
            ]
        },
    ],
}
