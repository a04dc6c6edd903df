from splashsurf_tpu.cli import main

main()
