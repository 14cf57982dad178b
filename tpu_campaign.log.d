WARNING:2026-08-20 09:27:53,110:jax._src.xla_bridge:905: Platform 'axon' is experimental and not all JAX functionality may be correctly supported!
device: TPU v5 lite0
  wqkv default #0                    16.8 us      0.00 TFLOPS     468.6 GB/s
  wqkv tn1024 #0                     17.6 us      0.00 TFLOPS     447.3 GB/s
  wqkv tn2048/tkp512 #0              16.2 us      0.00 TFLOPS     484.5 GB/s
  wqkv tn1024/tkp512 #0              18.1 us      0.00 TFLOPS     433.8 GB/s
  wqkv tn3072 #0                     17.8 us      0.00 TFLOPS     441.0 GB/s
  wo default #0                       8.2 us      0.00 TFLOPS     321.5 GB/s
  wo tn512 #0                         8.4 us      0.00 TFLOPS     311.8 GB/s
  wo tn1024/tkp512 #0                 8.3 us      0.00 TFLOPS     314.0 GB/s
  wo tn2048/tkp512 #0                 8.2 us      0.00 TFLOPS     321.4 GB/s
  wo tn2048/tkp256 #0                 8.0 us      0.00 TFLOPS     326.7 GB/s
  wgu default #0                     34.4 us      0.00 TFLOPS     610.3 GB/s
  wgu tn4096 #0                      34.1 us      0.00 TFLOPS     615.5 GB/s
  wgu tn1024 #0                      34.5 us      0.00 TFLOPS     607.4 GB/s
  wgu tn4096/tkp512 #0               32.6 us      0.00 TFLOPS     642.5 GB/s
  w_down default #0                  26.3 us      0.00 TFLOPS     398.2 GB/s
  w_down tkp1024 #0                  25.6 us      0.00 TFLOPS     409.6 GB/s
  w_down tkp2048 #0                  25.7 us      0.00 TFLOPS     408.5 GB/s
  w_down tkp256 #0                   27.9 us      0.00 TFLOPS     375.7 GB/s
  w_down tn1024/tkp1024 #0           28.3 us      0.00 TFLOPS     370.7 GB/s
  lm_head default #0                 59.1 us      0.00 TFLOPS     692.5 GB/s
  lm_head tkp1024 #0                 56.7 us      0.00 TFLOPS     722.6 GB/s
  lm_head tn2048 #0                  68.9 us      0.00 TFLOPS     594.1 GB/s
  lm_head tn8192 #0                  57.8 us      0.00 TFLOPS     708.3 GB/s
  wqkv default #1                    16.6 us      0.00 TFLOPS     474.7 GB/s
  wqkv tn1024 #1                     17.1 us      0.00 TFLOPS     459.7 GB/s
  wqkv tn2048/tkp512 #1              16.3 us      0.00 TFLOPS     481.4 GB/s
  wqkv tn1024/tkp512 #1              17.7 us      0.00 TFLOPS     445.4 GB/s
  wqkv tn3072 #1                     17.7 us      0.00 TFLOPS     444.0 GB/s
  wo default #1                       7.9 us      0.00 TFLOPS     333.0 GB/s
  wo tn512 #1                         8.1 us      0.00 TFLOPS     322.0 GB/s
  wo tn1024/tkp512 #1                 8.1 us      0.00 TFLOPS     325.2 GB/s
  wo tn2048/tkp512 #1                 8.1 us      0.00 TFLOPS     322.4 GB/s
  wo tn2048/tkp256 #1                 8.1 us      0.00 TFLOPS     324.4 GB/s
  wgu default #1                     32.6 us      0.00 TFLOPS     644.2 GB/s
  wgu tn4096 #1                      34.1 us      0.00 TFLOPS     615.0 GB/s
  wgu tn1024 #1                      33.6 us      0.00 TFLOPS     624.6 GB/s
  wgu tn4096/tkp512 #1               32.3 us      0.00 TFLOPS     649.1 GB/s
  w_down default #1                  27.1 us      0.00 TFLOPS     387.6 GB/s
  w_down tkp1024 #1                  26.3 us      0.00 TFLOPS     399.4 GB/s
  w_down tkp2048 #1                  25.9 us      0.00 TFLOPS     405.2 GB/s
  w_down tkp256 #1                   28.7 us      0.00 TFLOPS     365.5 GB/s
  w_down tn1024/tkp1024 #1           28.3 us      0.00 TFLOPS     370.5 GB/s
  lm_head default #1                 59.4 us      0.00 TFLOPS     689.9 GB/s
  lm_head tkp1024 #1                 56.3 us      0.00 TFLOPS     727.0 GB/s
  lm_head tn2048 #1                  67.5 us      0.00 TFLOPS     607.0 GB/s
  lm_head tn8192 #1                  57.4 us      0.00 TFLOPS     713.9 GB/s
  wqkv default #2                    16.6 us      0.00 TFLOPS     472.7 GB/s
  wqkv tn1024 #2                     16.9 us      0.00 TFLOPS     464.2 GB/s
  wqkv tn2048/tkp512 #2              16.6 us      0.00 TFLOPS     472.7 GB/s
  wqkv tn1024/tkp512 #2              17.1 us      0.00 TFLOPS     459.4 GB/s
  wqkv tn3072 #2                     18.4 us      0.00 TFLOPS     427.7 GB/s
  wo default #2                       8.2 us      0.00 TFLOPS     319.0 GB/s
  wo tn512 #2                         7.8 us      0.00 TFLOPS     336.8 GB/s
  wo tn1024/tkp512 #2                 8.2 us      0.00 TFLOPS     318.7 GB/s
  wo tn2048/tkp512 #2                 7.6 us      0.00 TFLOPS     345.1 GB/s
  wo tn2048/tkp256 #2                 8.1 us      0.00 TFLOPS     322.9 GB/s
  wgu default #2                     32.5 us      0.00 TFLOPS     645.3 GB/s
  wgu tn4096 #2                      34.1 us      0.00 TFLOPS     615.7 GB/s
  wgu tn1024 #2                      34.4 us      0.00 TFLOPS     610.0 GB/s
  wgu tn4096/tkp512 #2               32.5 us      0.00 TFLOPS     645.0 GB/s
  w_down default #2                  26.6 us      0.00 TFLOPS     394.8 GB/s
  w_down tkp1024 #2                  27.1 us      0.00 TFLOPS     386.8 GB/s
  w_down tkp2048 #2                  25.7 us      0.00 TFLOPS     408.4 GB/s
  w_down tkp256 #2                   28.3 us      0.00 TFLOPS     370.1 GB/s
  w_down tn1024/tkp1024 #2           28.1 us      0.00 TFLOPS     372.5 GB/s
  lm_head default #2                 55.8 us      0.00 TFLOPS     733.5 GB/s
  lm_head tkp1024 #2                 57.7 us      0.00 TFLOPS     709.9 GB/s
  lm_head tn2048 #2                  66.3 us      0.00 TFLOPS     618.1 GB/s
  lm_head tn8192 #2                  56.8 us      0.00 TFLOPS     721.7 GB/s
  wqkv default #3                    16.6 us      0.00 TFLOPS     473.2 GB/s
  wqkv tn1024 #3                     17.1 us      0.00 TFLOPS     459.5 GB/s
  wqkv tn2048/tkp512 #3              16.1 us      0.00 TFLOPS     489.2 GB/s
  wqkv tn1024/tkp512 #3              17.9 us      0.00 TFLOPS     438.5 GB/s
  wqkv tn3072 #3                     18.1 us      0.00 TFLOPS     433.9 GB/s
  wo default #3                       8.1 us      0.00 TFLOPS     322.1 GB/s
  wo tn512 #3                         8.2 us      0.00 TFLOPS     320.1 GB/s
  wo tn1024/tkp512 #3                 8.6 us      0.00 TFLOPS     303.4 GB/s
  wo tn2048/tkp512 #3                 6.8 us      0.00 TFLOPS     387.6 GB/s
  wo tn2048/tkp256 #3                 7.7 us      0.00 TFLOPS     340.4 GB/s
  wgu default #3                     33.0 us      0.00 TFLOPS     636.5 GB/s
  wgu tn4096 #3                      33.8 us      0.00 TFLOPS     619.6 GB/s
  wgu tn1024 #3                      34.2 us      0.00 TFLOPS     613.3 GB/s
  wgu tn4096/tkp512 #3               32.4 us      0.00 TFLOPS     648.2 GB/s
  w_down default #3                  26.3 us      0.00 TFLOPS     399.3 GB/s
  w_down tkp1024 #3                  27.1 us      0.00 TFLOPS     387.4 GB/s
  w_down tkp2048 #3                  26.0 us      0.00 TFLOPS     403.7 GB/s
  w_down tkp256 #3                   28.2 us      0.00 TFLOPS     371.4 GB/s
  w_down tn1024/tkp1024 #3           28.5 us      0.00 TFLOPS     368.4 GB/s
  lm_head default #3                 61.7 us      0.00 TFLOPS     663.8 GB/s
  lm_head tkp1024 #3                 56.5 us      0.00 TFLOPS     724.6 GB/s
  lm_head tn2048 #3                  67.5 us      0.00 TFLOPS     606.9 GB/s
  lm_head tn8192 #3                  58.3 us      0.00 TFLOPS     703.0 GB/s
  wqkv default #4                    17.2 us      0.00 TFLOPS     458.4 GB/s
  wqkv tn1024 #4                     16.7 us      0.00 TFLOPS     470.4 GB/s
  wqkv tn2048/tkp512 #4              16.2 us      0.00 TFLOPS     485.2 GB/s
  wqkv tn1024/tkp512 #4              17.7 us      0.00 TFLOPS     443.1 GB/s
  wqkv tn3072 #4                     18.0 us      0.00 TFLOPS     437.3 GB/s
  wo default #4                       8.3 us      0.00 TFLOPS     317.6 GB/s
  wo tn512 #4                         9.2 us      0.00 TFLOPS     284.0 GB/s
  wo tn1024/tkp512 #4                 8.2 us      0.00 TFLOPS     319.4 GB/s
  wo tn2048/tkp512 #4                 7.6 us      0.00 TFLOPS     344.1 GB/s
  wo tn2048/tkp256 #4                 8.1 us      0.00 TFLOPS     323.5 GB/s
  wgu default #4                     32.4 us      0.00 TFLOPS     647.1 GB/s
  wgu tn4096 #4                      33.9 us      0.00 TFLOPS     619.2 GB/s
  wgu tn1024 #4                      34.3 us      0.00 TFLOPS     610.9 GB/s
  wgu tn4096/tkp512 #4               33.3 us      0.00 TFLOPS     629.4 GB/s
  w_down default #4                  26.6 us      0.00 TFLOPS     394.4 GB/s
  w_down tkp1024 #4                  26.2 us      0.00 TFLOPS     400.5 GB/s
  w_down tkp2048 #4                  26.1 us      0.00 TFLOPS     402.3 GB/s
  w_down tkp256 #4                   28.6 us      0.00 TFLOPS     366.3 GB/s
  w_down tn1024/tkp1024 #4           28.0 us      0.00 TFLOPS     373.9 GB/s
  lm_head default #4                 58.1 us      0.00 TFLOPS     704.4 GB/s
  lm_head tkp1024 #4                 56.5 us      0.00 TFLOPS     725.0 GB/s
  lm_head tn2048 #4                  68.4 us      0.00 TFLOPS     598.4 GB/s
  lm_head tn8192 #4                  58.1 us      0.00 TFLOPS     704.8 GB/s
  wqkv default #5                    16.6 us      0.00 TFLOPS     473.7 GB/s
  wqkv tn1024 #5                     17.4 us      0.00 TFLOPS     452.8 GB/s
  wqkv tn2048/tkp512 #5              15.9 us      0.00 TFLOPS     495.6 GB/s
  wqkv tn1024/tkp512 #5              18.0 us      0.00 TFLOPS     436.7 GB/s
  wqkv tn3072 #5                     18.0 us      0.00 TFLOPS     437.0 GB/s
  wo default #5                       7.9 us      0.00 TFLOPS     333.0 GB/s
  wo tn512 #5                         8.0 us      0.00 TFLOPS     325.8 GB/s
  wo tn1024/tkp512 #5                 8.6 us      0.00 TFLOPS     303.4 GB/s
  wo tn2048/tkp512 #5                 7.5 us      0.00 TFLOPS     350.1 GB/s
  wo tn2048/tkp256 #5                 7.8 us      0.00 TFLOPS     337.0 GB/s
  wgu default #5                     32.5 us      0.00 TFLOPS     645.1 GB/s
  wgu tn4096 #5                      33.9 us      0.00 TFLOPS     618.6 GB/s
  wgu tn1024 #5                      34.5 us      0.00 TFLOPS     608.4 GB/s
  wgu tn4096/tkp512 #5               32.9 us      0.00 TFLOPS     637.5 GB/s
  w_down default #5                  26.3 us      0.00 TFLOPS     398.3 GB/s
  w_down tkp1024 #5                  26.0 us      0.00 TFLOPS     403.3 GB/s
  w_down tkp2048 #5                  46.4 us      0.00 TFLOPS     225.8 GB/s
  w_down tkp256 #5                   27.9 us      0.00 TFLOPS     376.4 GB/s
  w_down tn1024/tkp1024 #5           28.4 us      0.00 TFLOPS     368.9 GB/s
  lm_head default #5                 58.9 us      0.00 TFLOPS     695.2 GB/s
  lm_head tkp1024 #5                 56.9 us      0.00 TFLOPS     719.7 GB/s
  lm_head tn2048 #5                  67.1 us      0.00 TFLOPS     610.0 GB/s
  lm_head tn8192 #5                  58.1 us      0.00 TFLOPS     705.3 GB/s
  wqkv default #6                    16.5 us      0.00 TFLOPS     476.4 GB/s
  wqkv tn1024 #6                     16.6 us      0.00 TFLOPS     473.4 GB/s
  wqkv tn2048/tkp512 #6              20.2 us      0.00 TFLOPS     389.1 GB/s
  wqkv tn1024/tkp512 #6              19.3 us      0.00 TFLOPS     406.9 GB/s
  wqkv tn3072 #6                     16.6 us      0.00 TFLOPS     473.4 GB/s
  wo default #6                       8.6 us      0.00 TFLOPS     303.9 GB/s
  wo tn512 #6                        10.2 us      0.00 TFLOPS     256.6 GB/s
  wo tn1024/tkp512 #6                 8.8 us      0.00 TFLOPS     296.8 GB/s
  wo tn2048/tkp512 #6                 7.7 us      0.00 TFLOPS     341.1 GB/s
  wo tn2048/tkp256 #6                 8.3 us      0.00 TFLOPS     317.6 GB/s
  wgu default #6                     32.3 us      0.00 TFLOPS     648.7 GB/s
  wgu tn4096 #6                      32.6 us      0.00 TFLOPS     642.8 GB/s
  wgu tn1024 #6                      34.3 us      0.00 TFLOPS     611.3 GB/s
  wgu tn4096/tkp512 #6               32.7 us      0.00 TFLOPS     641.7 GB/s
  w_down default #6                  26.1 us      0.00 TFLOPS     401.3 GB/s
  w_down tkp1024 #6                  25.9 us      0.00 TFLOPS     404.5 GB/s
  w_down tkp2048 #6                  26.7 us      0.00 TFLOPS     393.3 GB/s
  w_down tkp256 #6                   28.2 us      0.00 TFLOPS     372.0 GB/s
  w_down tn1024/tkp1024 #6           28.3 us      0.00 TFLOPS     370.7 GB/s
  lm_head default #6                 58.3 us      0.00 TFLOPS     703.0 GB/s
  lm_head tkp1024 #6                 56.8 us      0.00 TFLOPS     720.8 GB/s
  lm_head tn2048 #6                  67.5 us      0.00 TFLOPS     607.1 GB/s
  lm_head tn8192 #6                  59.1 us      0.00 TFLOPS     693.1 GB/s
  wqkv default #7                    16.9 us      0.00 TFLOPS     464.2 GB/s
  wqkv tn1024 #7                     16.8 us      0.00 TFLOPS     467.1 GB/s
  wqkv tn2048/tkp512 #7              15.9 us      0.00 TFLOPS     493.2 GB/s
  wqkv tn1024/tkp512 #7              17.8 us      0.00 TFLOPS     441.8 GB/s
  wqkv tn3072 #7                     17.8 us      0.00 TFLOPS     441.5 GB/s
  wo default #7                       8.0 us      0.00 TFLOPS     329.6 GB/s
  wo tn512 #7                         9.4 us      0.00 TFLOPS     278.8 GB/s
  wo tn1024/tkp512 #7                 8.4 us      0.00 TFLOPS     310.6 GB/s
  wo tn2048/tkp512 #7                 7.7 us      0.00 TFLOPS     340.1 GB/s
  wo tn2048/tkp256 #7                 7.9 us      0.00 TFLOPS     331.2 GB/s
  wgu default #7                     31.8 us      0.00 TFLOPS     659.1 GB/s
  wgu tn4096 #7                      35.4 us      0.00 TFLOPS     593.0 GB/s
  wgu tn1024 #7                      33.8 us      0.00 TFLOPS     620.7 GB/s
  wgu tn4096/tkp512 #7               33.1 us      0.00 TFLOPS     633.1 GB/s
  w_down default #7                  25.8 us      0.00 TFLOPS     406.5 GB/s
  w_down tkp1024 #7                  26.0 us      0.00 TFLOPS     402.9 GB/s
  w_down tkp2048 #7                  25.4 us      0.00 TFLOPS     413.2 GB/s
  w_down tkp256 #7                   28.2 us      0.00 TFLOPS     372.3 GB/s
  w_down tn1024/tkp1024 #7           28.8 us      0.00 TFLOPS     364.2 GB/s
  lm_head default #7                 58.1 us      0.00 TFLOPS     705.1 GB/s
  lm_head tkp1024 #7                 56.3 us      0.00 TFLOPS     728.2 GB/s
  lm_head tn2048 #7                  68.3 us      0.00 TFLOPS     599.5 GB/s
  lm_head tn8192 #7                  56.5 us      0.00 TFLOPS     725.4 GB/s

medians (vs 900 GB/s stream floor):
  wqkv default                 16.6 us   473.0 GB/s  1.90x floor
  wqkv tn1024                  17.0 us   461.9 GB/s  1.95x floor
  wqkv tn2048/tkp512           16.2 us   484.8 GB/s  1.86x floor
  wqkv tn1024/tkp512           17.9 us   440.1 GB/s  2.04x floor
  wqkv tn3072                  17.9 us   439.2 GB/s  2.05x floor
  wo default                    8.1 us   321.8 GB/s  2.80x floor
  wo tn512                      8.3 us   315.9 GB/s  2.85x floor
  wo tn1024/tkp512              8.4 us   312.3 GB/s  2.88x floor
  wo tn2048/tkp512              7.7 us   342.6 GB/s  2.63x floor
  wo tn2048/tkp256              8.1 us   325.6 GB/s  2.76x floor
  wgu default                  32.5 us   645.2 GB/s  1.39x floor
  wgu tn4096                   34.0 us   617.1 GB/s  1.46x floor
  wgu tn1024                   34.3 us   611.1 GB/s  1.47x floor
  wgu tn4096/tkp512            32.7 us   642.1 GB/s  1.40x floor
  w_down default               26.3 us   398.3 GB/s  2.26x floor
  w_down tkp1024               26.1 us   401.7 GB/s  2.24x floor
  w_down tkp2048               25.9 us   404.5 GB/s  2.23x floor
  w_down tkp256                28.2 us   371.7 GB/s  2.42x floor
  w_down tn1024/tkp1024        28.3 us   370.6 GB/s  2.43x floor
  lm_head default              58.6 us   699.1 GB/s  1.29x floor
  lm_head tkp1024              56.6 us   723.6 GB/s  1.24x floor
  lm_head tn2048               67.5 us   606.9 GB/s  1.48x floor
  lm_head tn8192               58.0 us   706.8 GB/s  1.27x floor

winners:
  wqkv       -> wqkv tn2048/tkp512 (16.2 us)
  wo         -> wo tn2048/tkp512 (7.7 us)
  wgu        -> wgu default (32.5 us)
  w_down     -> w_down tkp2048 (25.9 us)
  lm_head    -> lm_head tkp1024 (56.6 us)

per-step GEMM total at winners: 1373 us (16 layers + lm_head)
